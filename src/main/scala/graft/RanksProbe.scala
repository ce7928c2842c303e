package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Mechanism probe for Ranks.byValue's exchange-reuse claim: the range
  * exchange feeds BOTH the offsets aggregate and the ranked branch — if
  * ReuseExchange serves them from one shuffle, total shuffle-write
  * records ≈ N (+ the tiny offsets rows); if the corpus range-shuffles
  * once per consumer, ≈ 2N. Not part of the driver contract.
  *
  * Usage: runMain graft.RanksProbe [nRows]
  */
object RanksProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.util.GraftSession.local(8, 8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(n).select(col("id"),
        (col("id") % 3).cast("string").as("g"))
      .withColumn("_v", struct(col("id").as("_a")))
    val recs = new AtomicLong
    // listener-drain barrier: events for a listener arrive in order on one
    // queue, so once the SENTINEL job's end event is observed, every stage
    // event from the measured jobs has already been delivered — a fixed
    // sleep silently undercounted under load (round-11 advice)
    val sentinelJob = new AtomicInteger(-1)
    val drained = new CountDownLatch(1)
    val lis = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
        recs.addAndGet(w)
        if (w > 0)
          println(s"[ranks-probe]   stage ${s.stageInfo.stageId}: wrote $w " +
            s"(${s.stageInfo.name.takeWhile(_ != '\n').take(80)})")
        ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (Option(j.properties)
            .exists(_.getProperty("spark.job.description") == "ranks-probe-sentinel"))
          sentinelJob.set(j.jobId)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (j.jobId == sentinelJob.get()) drained.countDown()
    }
    spark.sparkContext.addSparkListener(lis)
    // eager = false: identity finish — the probe wants the raw ranked
    // frame's shuffle profile, with no result cache in the measurement
    graft.ext.Ranks.byValue(df, "g", finish = identity, eager = false)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription("ranks-probe-sentinel")
    // collect on a 1-row range: single result stage, ZERO shuffle writes —
    // the sentinel must not contribute to the record count it flushes
    spark.range(1).collect()
    spark.sparkContext.setJobDescription(null)
    if (!drained.await(30, TimeUnit.SECONDS))
      println("[ranks-probe] WARNING: listener queue not drained in 30 s — count may be low")
    spark.sparkContext.removeSparkListener(lis)
    println(s"[ranks-probe] n=$n totalShuffleRecords=${recs.get} " +
      s"(reused ≈ n + offsets; duplicated ≈ 2n)")
    spark.stop()
  }
}
