package graft

import graft.ext.Corpus
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Per-dimension skipping probe for the N-DIM z-order layout (x160's
  * production claim): write the events table laid out by the 3-d Morton
  * curve over (user_id, event time, props length) and by the 1-d
  * time sort, then run single-dimension range predicates (middle ~10%
  * of each dimension) against both and read out what the parquet reader
  * actually materialized. The 3-d file should prune on EVERY dimension
  * (each dim's cell span tightens ~1/cbrt(groups) per file); the
  * time-sorted file prunes time only. Mirrors [[ZorderProbe]]'s 2-d
  * methodology (same measureScan counters, median-of-reps). Not part of
  * the driver contract.
  *
  * Usage: runMain graft.Zorder3Probe [sfDir] [reps] [shards]
  */
object Zorder3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val shards = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("props_len", length(col("props")).cast("long"))
    val b = e.agg(min("user_id"), max("user_id"), min("ts_us"),
      max("ts_us"), min("props_len"), max("props_len")).head()
    def mid(lo: Long, hi: Long): (Long, Long) =
      (lo + (hi - lo) * 45 / 100, lo + (hi - lo) * 55 / 100)
    val (u1, u2) = mid(b.getLong(0), b.getLong(1))
    val (t1, t2) = mid(b.getLong(2), b.getLong(3))
    val (p1, p2) = mid(b.getLong(4), b.getLong(5))

    val zDir = "target/zorder3_probe/z3"
    val tDir = "target/zorder3_probe/t"
    val z = Corpus.zorderLayoutN(e, "event_id",
      Seq("user_id", "ts_us", "props_len"), bits = 16, nShards = shards)
    e.join(z.select("event_id", "zvalue", "shard"), "event_id")
      .repartitionByRange(shards, col("shard"), col("zvalue"))
      .sortWithinPartitions("zvalue")
      .drop("zvalue", "shard")
      .write.mode("overwrite").parquet(zDir)
    e.repartitionByRange(shards, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(tDir)

    val total = spark.read.parquet(zDir).count()
    val preds = Seq(
      "all-dims" -> (col("user_id").between(u1, u2) &&
        col("ts_us").between(t1, t2) && col("props_len").between(p1, p2)),
      "user-only" -> col("user_id").between(u1, u2),
      "time-only" -> col("ts_us").between(t1, t2),
      "plen-only" -> col("props_len").between(p1, p2))
    for ((ptag, pred) <- preds; (tag, d) <- Seq("zorder3" -> zDir,
        "timesort" -> tDir)) {
      val runs = (1 to reps).map { _ =>
        Probe.measureScan(spark) {
          spark.read.parquet(d).filter(pred).groupBy().count()
            .head().getLong(0)
        }
      }
      val med = runs.map(_._1).sorted.apply((reps - 1) / 2)
      val medRows = runs.map(_._3).sorted.apply((reps - 1) / 2)
      println(f"[zorder3-probe] $ptag%-9s $tag%-8s " +
        f"matches=${runs.head._2}%8d rows_read=$medRows%10d " +
        f"(${medRows * 100.0 / total}%5.1f%%) median=$med%6.3f s reps=" +
        runs.map(r => f"${r._1}%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
