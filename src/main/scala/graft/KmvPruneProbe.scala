package graft

import org.apache.spark.sql.functions._

/** A/B for the shardStatsSketch KMV-leg fix (round-13 weak #1): on a
  * HIGH-NDV stats column, the old shape windowed
  * `row_number().over(partitionBy(shard))` directly over the full
  * distinct (shard, hash) stream — the exchange carried every distinct
  * hash and each shard's whole distinct set sorted on one reducer. The
  * new shape ([[graft.ext.Corpus.bottomKPerGroup]], shared with
  * kmvSketch) prunes per partition to a bounded TreeSet first, so
  * everything past the map side is ≤ partitions×k rows. This probe runs
  * both shapes over an all-distinct column (worst case: NDV = rows) and
  * reports wall + total shuffle-write records. Not driver contract.
  *
  * Usage: runMain graft.KmvPruneProbe [nRows] [nShards] [k] [reps]
  */
object KmvPruneProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nShards = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val reps = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def input = spark.range(nRows)
      .select((col("id") % nShards).cast("int").as("shard"),
        col("id").as("v"))
    val h = conv(substring(md5(concat(lit("kmv|"),
      col("v").cast("string"))), 1, 15), 16, 10).cast("long")

    def measure(tag: String)(mk: () => org.apache.spark.sql.DataFrame)
        : Unit = {
      val shuffled = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            shuffled.addAndGet(
              t.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      val runs = (1 to reps).map { _ =>
        Thread.sleep(300); shuffled.set(0L)
        spark.sparkContext.addSparkListener(l)
        try {
          val t0 = System.nanoTime()
          val n = mk().groupBy().count().head().getLong(0)
          val el = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          (el, n, shuffled.get())
        } finally spark.sparkContext.removeSparkListener(l)
      }
      val med = runs.map(_._1).sorted.apply((reps - 1) / 2)
      val medSh = runs.map(_._3).sorted.apply((reps - 1) / 2)
      println(f"[kmv-prune-probe] $tag%-12s rows_out=${runs.head._2}%6d " +
        f"shuffle_records=$medSh%12d median=$med%6.2f s reps=" +
        runs.map(r => f"${r._1}%.2f").mkString("[", ", ", "]"))
    }

    println(s"[kmv-prune-probe] nRows=$nRows (all-distinct worst case) " +
      s"nShards=$nShards k=$k")
    // OLD shape: full distinct exchange + per-shard full-NDV window
    measure("old-window") { () =>
      val w = Window.partitionBy(col("shard")).orderBy(col("_h"))
      input.select(col("shard"), h.as("_h")).filter(col("_h").isNotNull)
        .distinct()
        .withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
    }
    // NEW shape: bounded per-partition prune, exchange <= partitions*k
    measure("new-pruned") { () =>
      graft.ext.Corpus.bottomKPerGroup(
        input.select(col("shard"), h.as("_h"))
          .filter(col("_h").isNotNull), "shard", "_h", k, "_rk")
    }
    spark.stop()
  }
}
