package graft

import graft.ext.{Dedup, TextAnalysis}
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Growth probe for the incremental exact-substring screen (x152's
  * production contract): the maintained state (winnow pick table + text
  * table) is built UNTIMED over each scale's corpus, then a FIXED arrival
  * slice (the base corpus's `doc_id % 7 = 0` docs — ScaleData's offset
  * copies never reuse base ids, so it is the same batch at every scale)
  * is screened against it, timed. Reads out how much of the per-batch
  * cost is the batch's own winnow pass + batch-fp-bounded anchor join
  * (should be flat) vs the candidate-extension term (grows only with how
  * many corpus docs actually share the batch's fingerprints — ScaleData's
  * copies duplicate base text, so candidates grow with copies here,
  * honestly worst-case: at 100× every base-doc run has ~100 corpus
  * owners). Not part of the driver contract.
  *
  * Usage: runMain graft.XSubstrProbe [sfDir] [reps]
  */
object XSubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val baseMax = Tables(spark, "/root/testdata/sf0.1", "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    val batch = d.filter(col("doc_id") % 7 === 0 &&
      col("doc_id") <= baseMax)

    // maintained state, built untimed and persisted
    val picks = TextAnalysis.winnowFingerprints(
      graft.util.Par.spread(corpus), "text", "doc_id", k = 4, w = 5)
      .persist()
    val nPicks = picks.count()
    val texts = corpus.select(col("doc_id"), col("text")).persist()
    texts.count()
    println(s"[xsubstr] state: pick rows=$nPicks")

    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Dedup.exactSubstringAgainstPicks(batch, picks, texts, "text",
          "doc_id", minTokens = 8, k = 4, maxAnchorDf = 100000L)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[xsubstr] screen fixed batch: median=${ts.sorted.apply((reps - 1) / 2)}%6.2f s reps=" +
      ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    spark.stop()
  }
}
