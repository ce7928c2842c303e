package graft

import graft.util.Tables

/** Prices [[graft.ext.TextAnalysis.bpeTrain]] at PRODUCTION settings —
  * the registered fixture (x153) learns 8 merges; a real tokenizer is
  * 30–50k merges over a ~65k word vocab. The corpus-scale leg (one
  * word-count shuffle + topWords cut) is sf-bound and tiny; what this
  * probe prices is the DRIVER loop: Sennrich's incremental pair-count
  * cache + lazy-deletion heap vs the naive per-round recount the loop
  * replaced (the recount is O(nMerges × vocab tokens) — re-measured
  * here at a small nMerges and extrapolated, because running it at 30k
  * is exactly the minutes-class cost the cache removes).
  *
  * Usage: runMain graft.BpeTrainProbe [sfDir|synthetic:N] [nMerges]
  * [topWords] — `synthetic:N` builds an N-word md5-hex vocabulary (the
  * documents fixture's vocab exhausts after ~90 merges; a hex vocab of
  * 65k 32-char words sustains the production 30–50k merge range, which
  * is the regime this probe exists to price).
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(30000)
    val topWords = args.drop(2).headOption.map(_.toInt).getOrElse(65536)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs =
      if (dir.startsWith("synthetic:")) {
        val n = dir.stripPrefix("synthetic:").toLong
        spark.range(n).selectExpr("id AS doc_id",
          "md5(cast(id AS string)) AS text")
      } else Tables(spark, dir, "documents")

    // warm the word-count leg once so the trained run isolates cleanly
    import org.apache.spark.sql.functions._
    val nWords = docs
      .select(sum(size(split(col("text"), " "))).as("n"))
      .head().getLong(0)
    val t0 = System.nanoTime()
    val merges = graft.ext.TextAnalysis.bpeTrain(docs, "text",
      nMerges = nMerges, topWords = topWords)
    val learned = merges.count()
    val total = (System.nanoTime() - t0) / 1e9
    val last = merges.orderBy(col("rank").desc).limit(1).collect()
      .headOption
    println(f"[bpe-train-probe] sf=$dir corpus_tokens=$nWords " +
      f"requested=$nMerges topWords=$topWords learned=$learned " +
      f"wall=$total%.1f s last_rank=${last.map(_.getLong(0)).getOrElse(-1L)} " +
      f"last_count=${last.map(_.getLong(3)).getOrElse(-1L)}")
    spark.stop()
  }
}
