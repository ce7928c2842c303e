package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
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
    val lis = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
        recs.addAndGet(w)
        if (w > 0)
          println(s"[ranks-probe]   stage ${s.stageInfo.stageId}: wrote $w " +
            s"(${s.stageInfo.name.takeWhile(_ != '\n').take(80)})")
        ()
      }
    }
    spark.sparkContext.addSparkListener(lis)
    graft.ext.Ranks.byValue(df, "g")
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(lis)
    println(s"[ranks-probe] n=$n totalShuffleRecords=${recs.get} " +
      s"(reused ≈ n + offsets; duplicated ≈ 2n)")
    spark.stop()
  }
}
