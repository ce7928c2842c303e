package graft

import graft.ext.{Dedup, TextAnalysis}
import graft.util.Par
import org.apache.spark.sql.functions._

/** Mechanism probe for x95 vs x5: counts the PAIR-GENERATION exchange each
  * algorithm pays on the same corpus — x5's per-shared-gram pair
  * occurrences (Σ_{df ≤ maxDf} C(df,2)) versus x95's prefix-generated,
  * length-filtered candidate set — so the measured wall-clock crossover
  * (BASELINE.md round-9) has its cause on record, not just its effect.
  * Not part of the driver contract.
  */
object X95Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (n, thNum, thDen, maxDf) = (3, 3, 5, 1000)

    val ng = Par.spread(docs)
      .select(col("doc_id").as("_id"), TextAnalysis.tokens(col("text")).as("_t"))
      .select(col("_id"), explode(array_distinct(Dedup.wordNgrams(col("_t"), n))).as("_gs"))
      .select(col("_id"), xxhash64(col("_gs")).as("_g"))
    val dfs = ng.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf)

    // x5's exchange: one pair occurrence per shared gram. Integer
    // arithmetic throughout (df·(df-1) is even, so the halving is exact)
    // — the recorded mechanism numbers stay exact at any corpus size,
    // where a double sum would lose exactness past 2^53.
    val x5Pairs = dfs.agg(sum(col("_df") * (col("_df") - 1)).as("_s"))
      .head().getLong(0) / 2

    // x95's exchange: prefix-bucket pairs, then after the length filter,
    // then the distinct candidate set that reaches the verify join
    val docArr = ng.join(dfs, Seq("_g"))
      .groupBy(col("_id"))
      .agg(array_sort(collect_list(struct(col("_df"), col("_g")))).as("_sg"))
      .select(col("_id"),
        transform(col("_sg"), s => s.getField("_g")).as("_ga"),
        size(col("_sg")).as("_n"))
    val pfxLen = (col("_n") - floor((col("_n") * thNum + (thDen - 1))
      / thDen).cast("int") + 1)
    val prefix = docArr
      .select(col("_id"), col("_n"), explode(slice(col("_ga"), lit(1), pfxLen)).as("_g"))
    val buckets = prefix.groupBy(col("_g"))
      .agg(count(lit(1)).as("_c"))
    val rawPfxPairs = buckets.agg(sum(col("_c") * (col("_c") - 1)).as("_s"))
      .head().getLong(0) / 2
    val cands = Dedup.ngramJaccardPairsPrefix(docs, "text", "doc_id",
      n, thNum, thDen, maxDf)
    val survivors = cands.count()

    println(s"[x95probe] dir=$dir")
    println(s"[x95probe] x5 shared-gram pair occurrences: $x5Pairs")
    println(s"[x95probe] x95 prefix-bucket pair occurrences: $rawPfxPairs")
    println(f"[x95probe] exchange ratio x5/x95: ${x5Pairs.toDouble / rawPfxPairs}%.1f")
    println(s"[x95probe] final qualifying pairs: $survivors")
    spark.stop()
  }
}
