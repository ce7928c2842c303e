package graft

import graft.util.Tables
import org.apache.spark.sql.functions._

/** Prices [[graft.ext.TextAnalysis.bpeApply]] at the PRODUCTION merge
  * table — the registered fixture (x148) replays 8 merges; a real
  * tokenizer replays 30–50k. The per-row loop
  * ([[graft.functions.BpeMerge]]) is one leftmost-greedy pass over the
  * token array PER MERGE, so the expectation is LINEAR in table size
  * (with an early exit once a value collapses to one token); this probe
  * measures both regimes:
  *
  *  - synthetic leg: the 30k table applied to the vocabulary it was
  *    trained on (single-word values, merges fire and collapse — the
  *    early-exit-friendly case);
  *  - documents leg: the same table applied to real multi-word text the
  *    merges mostly MISS (n stays high, every merge pays its full pass —
  *    the worst case the linear bound prices).
  *
  * An 8-merge run on the same corpus anchors the linear expectation:
  * wall(30k) ≲ wall(8) × 30000/8 means the loop is behaving; exceeding
  * it is the optimize signal (BASELINE.md records the verdict).
  *
  * Usage: runMain graft.BpeApplyProbe [sfDir] [nMerges] [vocabWords]
  */
object BpeApplyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(30000)
    val vocabWords =
      args.drop(2).headOption.map(_.toLong).getOrElse(65536L)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.TextAnalysis

    val vocab = spark.range(vocabWords)
      .selectExpr("id AS doc_id", "md5(cast(id AS string)) AS text")
      .persist()
    val t0 = System.nanoTime()
    val merges = TextAnalysis.bpeTrain(vocab, "text", nMerges = nMerges,
        topWords = vocabWords.toInt)
      .select(col("rank"), col("lhs").as("left"), col("rhs").as("right"))
      .persist()
    val learned = merges.count()
    val tTrain = (System.nanoTime() - t0) / 1e9

    def timeApply(docs: org.apache.spark.sql.DataFrame, m: org.apache
        .spark.sql.DataFrame, reps: Int = 3): (Double, Long) = {
      var best = Double.MaxValue
      var toks = 0L
      (0 until reps).foreach { _ =>
        val t = System.nanoTime()
        toks = TextAnalysis.bpeApply(docs, "text", "doc_id", m)
          .agg(sum(col("n_tokens"))).head().getLong(0)
        best = math.min(best, (System.nanoTime() - t) / 1e9)
      }
      (best, toks)
    }

    val docs = Tables(spark, dir, "documents").persist()
    docs.count()
    val anchor = merges.orderBy(col("rank").asc).limit(8)
    val (wallAnchorDocs, _) = timeApply(docs, anchor)
    val (wallSynth, toksSynth) = timeApply(vocab, merges)
    val (wallDocs, toksDocs) = timeApply(docs, merges)
    val linearBound = wallAnchorDocs * learned / 8.0
    println(f"[bpe-apply-probe] sf=$dir merges=$learned " +
      f"(train=$tTrain%.1f s) anchor8_docs=$wallAnchorDocs%.2f s " +
      f"synth=${wallSynth}%.2f s (tokens=$toksSynth) " +
      f"docs=${wallDocs}%.2f s (tokens=$toksDocs) " +
      f"linear_bound_docs=$linearBound%.1f s " +
      f"verdict=${if (wallDocs <= linearBound) "LINEAR-OK" else "SUPERLINEAR"}")
    spark.stop()
  }
}
