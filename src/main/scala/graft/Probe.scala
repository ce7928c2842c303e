package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: `runMain graft.Probe <sfDir> <query>[,query...] [--explain]`
  * — times named SparkEntry queries one by one (fresh-cache) and optionally
  * dumps their formatted physical plans. Not part of the driver contract.
  */
object Probe {

  /** Run `action` and return (wall s, result, recordsRead, bytesRead)
    * from task INPUT metrics — the row-group-skipping signal (a skipped
    * row group's rows are never read), robust to AQE query-stage
    * wrapping. The listener lives for THIS call alone: registered after
    * a drain sleep (so a prior run's straggling TaskEnd events land on
    * no counter), removed in finally — per-rep counters cannot bleed
    * across variants. Shared by the skipping probes (ZorderProbe,
    * Zorder3Probe, PrunedScanProbe).
    */
  def measureScan(spark: SparkSession)(action: => Long)
      : (Double, Long, Long, Long) = {
    val recs = new java.util.concurrent.atomic.AtomicLong
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
        }
    }
    Thread.sleep(300) // prior variant's stragglers land before we listen
    spark.sparkContext.addSparkListener(l)
    try {
      val t0 = System.nanoTime()
      val n = action
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain this run's own stragglers
      (el, n, recs.get(), bytes.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).filterNot(a => a == "all" || a.startsWith("--"))
      .map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // time INSIDE the construction too: operators that materialize
      // eagerly (dedup caches, iterative clustering, pipeline runs) do
      // their work in the query function, not at the sink
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (doExplain) { println(s"== $name =="); df.explain("formatted") }
      // full-compute materialization (same noop sink as Bench — count()
      // would let Catalyst prune the projections and trailing sort)
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
