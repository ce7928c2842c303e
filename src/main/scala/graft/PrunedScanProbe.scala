package graft

import graft.util.{Scan, Tables}
import org.apache.spark.sql.functions._

/** Evidence that the manifest-pruned read (x161/x162) routes REAL I/O:
  * publish the z-ordered events table shard-partitioned with its stats +
  * bloom manifests ([[graft.util.Scan.writeSharded]]), then compare three
  * reads of the same 2-d range predicate — full scan, Spark's own
  * min/max pushdown over the laid-out files, and the manifest-pruned
  * read — plus the bloom point lookup. For each: files listed (distinct
  * `input_file_name` of rows actually surviving), candidate shards, rows
  * read from task input metrics, wall. The pruned read must (a) match
  * the full scan's aggregate exactly and (b) open exactly the candidate
  * shard files. Not part of the driver contract.
  *
  * Usage: runMain graft.PrunedScanProbe [sfDir] [reps] [shards]
  */
object PrunedScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val shards = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val table = "target/pruned_scan_probe/events_z"
    val e = Tables(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val laid = graft.ext.Corpus.zorderLayout(e, "event_id", "user_id",
      "ts_us", bits = 16, nShards = shards,
      keepCols = Seq("user_id", "ts_us", "event_type"))
      .drop("cell_x", "cell_y")
    Scan.writeSharded(spark, laid, table,
      statCols = Seq("user_id", "ts_us"), sortCol = Some("zvalue"),
      bloomKeyCol = Some("user_id"))

    val b = e.agg(min("user_id"), max("user_id"), min("ts_us"),
      max("ts_us")).head()
    def mid(lo: Long, hi: Long): (Long, Long) =
      (lo + (hi - lo) * 45 / 100, lo + (hi - lo) * 55 / 100)
    val (u1, u2) = mid(b.getLong(0), b.getLong(1))
    val (t1, t2) = mid(b.getLong(2), b.getLong(3))
    val ranges = Seq(("user_id", u1, u2), ("ts_us", t1, t2))
    val pred = col("user_id").between(u1, u2) &&
      col("ts_us").between(t1, t2)
    val cands = Scan.candidateShardsByStats(
      Scan.statsManifest(spark, table), ranges)
    val total = spark.read.parquet(table).count()
    println(s"[pruned-probe] shards=$shards candidates=${cands.size} " +
      s"rows_total=$total")

    def report(tag: String, mk: () => org.apache.spark.sql.DataFrame)
        : Unit = {
      // files contributing surviving rows (for the pruned variants this
      // equals the files LISTED; the full scan lists all of them and
      // this counts only the matching ones — the listing skip itself is
      // pinned by ScanSpec's opens-exactly-candidates case)
      val files = mk().select(input_file_name()).distinct().count()
      val runs = (1 to reps).map { _ =>
        Probe.measureScan(spark) {
          mk().groupBy().agg(count(lit(1)).as("n"),
            sum("user_id").as("s")).head().getLong(0)
        }
      }
      val med = runs.map(_._1).sorted.apply((reps - 1) / 2)
      val medRows = runs.map(_._3).sorted.apply((reps - 1) / 2)
      println(f"[pruned-probe] $tag%-14s matches=${runs.head._2}%8d " +
        f"files_opened=$files%4d rows_read=$medRows%10d " +
        f"(${medRows * 100.0 / total}%5.1f%%) median=$med%6.3f s reps=" +
        runs.map(r => f"${r._1}%.3f").mkString("[", ", ", "]"))
    }
    // full-scan: parquet min/max pushdown OFF — every file read whole;
    // pushdown-only: Spark's own row-group skipping over the laid-out
    // files (files all LISTED and footers read, rows skipped);
    // manifest-pruned: candidate shards only — non-candidates never
    // listed past the manifest row
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    report("full-scan", () => spark.read.parquet(table).filter(pred))
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    report("pushdown-only", () => spark.read.parquet(table).filter(pred))
    report("manifest-pruned",
      () => Scan.readPrunedByRange(spark, table, ranges))

    // bloom point lookup: smallest user_id at/above the 45% point
    val key = e.filter(col("user_id") >= u1).agg(min("user_id"))
      .head().getLong(0)
    val bCands = Scan.candidateShardsByKey(
      Scan.bloomManifest(spark, table), key)
    println(s"[pruned-probe] point key=$key " +
      s"bloom_candidates=${bCands.size}/$shards")
    report("point-full", () =>
      spark.read.parquet(table).filter(col("user_id") === key))
    report("point-bloom", () =>
      Scan.readPrunedByKey(spark, table, "user_id", key))
    spark.stop()
  }
}
