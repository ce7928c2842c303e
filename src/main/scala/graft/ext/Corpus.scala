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
