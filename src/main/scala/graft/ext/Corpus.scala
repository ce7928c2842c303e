package graft.ext

import graft.util.Par
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators: per-stratum caps and vocabulary
  * statistics — the mixing/inspection passes a large-scale dataset build
  * runs between dedup and export.
  */
object Corpus {

  /** Deterministic stratified head sample: at most `k` rows per stratum,
    * chosen by a stable md5 order over the id (reproducible anywhere,
    * uncorrelated with ingestion order — a plain `limit` would bias toward
    * whatever happened to be written first). One window = one shuffle on
    * the stratum key; this is the standard per-class cap when assembling a
    * training mix, and the shape survives any corpus size because state
    * per stratum is the k retained rows.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(concat_ws("|", col(idCol))), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Per-stratum embedding centroid: the element-wise mean vector of each
    * stratum's embeddings (class prototypes for data audits / classifier
    * init), emitted long-form as (stratum, pos, mean) so the result is
    * flat-comparable. Determinism at scale: each element sums as an exact
    * DECIMAL(28,10) (decimal addition commutes) followed by one double
    * division — partitioning-invariant, same device as the IVF k-means
    * means. One equi-join docs↔embeddings + one grouped aggregate; shuffle
    * is O(strata × dims).
    */
  def strataCentroids(docs: DataFrame, strataCol: String, docIdCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String): DataFrame =
    docs.select(col(docIdCol).as("_did"), col(strataCol))
      .join(emb.select(col(vecIdCol).as("_did"), col(vecCol).as("_v")), Seq("_did"))
      .select(col(strataCol), posexplode(col("_v")).as(Seq("pos", "_val")))
      .groupBy(col(strataCol), col("pos"))
      .agg((sum(col("_val").cast("decimal(28,10)")).cast("double") /
        count(lit(1))).as("mean"))

  /** Top-k terms per stratum by exact occurrence count (ties broken by
    * term, so the result is deterministic): token explode → partial-agg
    * count (map-side combine keeps shuffle O(distinct terms)) → per-stratum
    * rank. The canonical vocabulary-inspection pass.
    */
  def topTermsPerStratum(docs: DataFrame, strataCol: String, textCol: String,
      k: Int): DataFrame = {
    val counts = Par.spread(docs)
      .select(col(strataCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(strataCol), col("term"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("n").desc, col("term").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
