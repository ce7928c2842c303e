package graft

import graft.ext.Corpus
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Skipping probe for the z-order layout (x154's production claim): write
  * the events table twice — (a) range-partitioned + sorted by `zvalue`
  * over (user_id, event time), (b) the 1-D alternative, sorted by time
  * only — then run the same 2-d range predicate (middle ~10% of each
  * dimension, ~1% joint selectivity) against both and read out what the
  * parquet reader actually materialized: the scan node's output rows
  * (rows surviving row-group/page skipping from the pushed min/max
  * filters) and wall time. The z-order file should emit FAR fewer rows
  * from the scan because every row group is tight on BOTH dimensions;
  * the time-sorted file is tight on time but spans all users, so the
  * user predicate skips nothing. Not part of the driver contract.
  *
  * Granularity is the lever: per-dimension envelopes tighten with the
  * row-group count (each dim's cell span ~ 1/√groups), so the probe takes
  * the file count as an argument — at cluster scale one table has
  * thousands of row groups where this local probe writes 64-256 files.
  *
  * Usage: runMain graft.ZorderProbe [sfDir] [reps] [shards]
  */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val shards = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val b = e.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us"))
      .head()
    val (uLo, uHi, tLo, tHi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // middle ~10% of each dimension
    def mid(lo: Long, hi: Long): (Long, Long) =
      (lo + (hi - lo) * 45 / 100, lo + (hi - lo) * 55 / 100)
    val (u1, u2) = mid(uLo, uHi)
    val (t1, t2) = mid(tLo, tHi)

    val zDir = "target/zorder_probe/z"
    val tDir = "target/zorder_probe/t"
    val z = Corpus.zorderLayout(e, "event_id", "user_id", "ts_us",
      bits = 16, nShards = shards)
    e.join(z, "event_id")
      .repartitionByRange(shards, col("shard"), col("zvalue"))
      .sortWithinPartitions("zvalue")
      .drop("cell_x", "cell_y", "zvalue", "shard")
      .write.mode("overwrite").parquet(zDir)
    e.repartitionByRange(shards, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(tDir)

    val total = spark.read.parquet(zDir).count()
    val preds = Seq(
      "both-dims" -> (col("user_id").between(u1, u2) &&
        col("ts_us").between(t1, t2)),
      "user-only" -> col("user_id").between(u1, u2),
      "time-only" -> col("ts_us").between(t1, t2))
    for ((ptag, pred) <- preds; (tag, d) <- Seq("zorder" -> zDir,
        "timesort" -> tDir)) {
      val runs = (1 to reps).map { _ =>
        Probe.measureScan(spark) {
          spark.read.parquet(d).filter(pred).groupBy().count()
            .head().getLong(0)
        }
      }
      val med = runs.map(_._1).sorted.apply((reps - 1) / 2)
      // median rows_read across reps (not rep 1's), counters isolated
      // per rep by measureScan's fresh listener — no straggler bleed
      val medRows = runs.map(_._3).sorted.apply((reps - 1) / 2)
      println(f"[zorder-probe] $ptag%-9s $tag%-8s " +
        f"matches=${runs.head._2}%8d rows_read=$medRows%10d " +
        f"(${medRows * 100.0 / total}%5.1f%%) median=$med%6.3f s reps=" +
        runs.map(r => f"${r._1}%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
