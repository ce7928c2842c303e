package graft

import java.util.concurrent.atomic.AtomicLong

import graft.ext.{Corpus, Dedup, TextAnalysis}
import graft.util.Par
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Mechanism probe for the CMS-vs-exact claim: measures the ACTUAL
  * shuffle (records + bytes) each 3-gram frequency pass pays on the same
  * corpus — the exact count's per-partition-distinct gram exchange versus
  * the CMS aggregate's (row, bucket)-capped exchange — so the scale story
  * has measured numbers, including the honest small-corpus crossover: on
  * a corpus whose per-partition gram diversity is BELOW depth×width the
  * exact exchange is the smaller one, and the sketch only wins once the
  * gram universe outgrows the cap (the regime 100 TB lives in). Not part
  * of the driver contract.
  *
  * Usage: runMain graft.CmsProbe [sfDir] [width,width,...]
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val widths = args.drop(1).headOption.map(_.split(',').toSeq.map(_.trim.toInt))
      .getOrElse(Seq(8192))
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def measure(label: String)(job: => Unit): Unit = {
      val recs = new AtomicLong
      val bytes = new AtomicLong
      val lis = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          recs.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(lis)
      val t0 = System.nanoTime()
      job
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus is async; let it drain
      spark.sparkContext.removeSparkListener(lis)
      println(f"[cmsprobe] $label%-28s took=$dt%7.2f s " +
        f"shuffleRecords=${recs.get}%,d shuffleMB=${bytes.get / 1e6}%.1f")
    }

    // the exact pass: what topTerms-style counting pays — the exchange
    // carries one row per DISTINCT gram per map partition (map-side
    // partial agg), growing with the gram universe forever
    measure("exact gram count") {
      Par.spread(docs).filter(col("text").isNotNull)
        .select(explode(
          Dedup.wordNgrams(TextAnalysis.tokens(col("text")), 3)).as("_g"))
        .groupBy(col("_g")).agg(count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save()
    }
    // the CMS pass at each width: the exchange is capped at
    // partitions × depth × width rows no matter the gram universe
    widths.foreach { w =>
      measure(s"cms sketch width=$w") {
        Corpus.cmsSketch(docs, "text", n = 3, depth = 4, width = w)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
