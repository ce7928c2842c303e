package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity auditing and suppression over quasi-identifier columns.
  *
  * A released dataset is k-anonymous when every combination of
  * quasi-identifier (QI) values — the columns that could re-identify a
  * person by linkage (language, source domain, size bands, dates…) — is
  * shared by at least `k` rows (Sweeney 2002). Training-data releases care
  * for the same reason curated-corpus PII scans ([[TextAnalysis.piiCounts]])
  * do: rare metadata combinations leak identity even after text redaction.
  *
  * Both entry points follow the library's verdict-not-filter contract:
  * callers see WHY a row is at risk (its class size), not just a filtered
  * survivor set.
  */
object Privacy {

  /** Equivalence-class report: one row per distinct QI combination with its
    * `class_size` and `at_risk` = (`class_size` < `k`).
    *
    * Scale shape: ONE aggregate keyed on the QI tuple with map-side
    * combine — output rows = QI-combination cardinality, not corpus rows.
    * NULL QI values form their own class (Spark groupBy null semantics,
    * matching SQL GROUP BY), so missing metadata is audited, not dropped.
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String], k: Int)
      : DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k > 0, s"need k > 0, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity report (Machanavajjhala et al. 2007): k-anonymity alone
    * fails when an equivalence class, however large, is homogeneous in the
    * SENSITIVE attribute — every member shares it, so linkage to the class
    * discloses the value. Per QI class: `class_size`, `n_sensitive`
    * (distinct non-NULL sensitive values), and `at_risk` =
    * (`n_sensitive` < `l`). Release gates require both reports.
    *
    * Scale shape: one aggregate keyed on the QI tuple; the distinct count
    * is Spark's two-stage partial-distinct (keys spread over
    * (QI, sensitive) first), so a dominant class doesn't concentrate its
    * raw rows on one reducer.
    */
  def lDiversityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l > 0, s"need l > 0, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** Row-level suppression: every row joins its equivalence-class size;
    * rows in classes smaller than `k` come back with their QI columns
    * nulled (suppressed) and `suppressed` = true, all other columns
    * untouched. Every SURVIVING QI combination has ≥ `k` members by
    * construction; suppressed rows collapse into the all-NULL class, which
    * may itself be small but carries no quasi-identifier information to
    * link on (the standard suppression-model reading of k-anonymity).
    *
    * Scale shape: the class table ([[kAnonymityReport]] output, bounded by
    * QI cardinality) joins back against the corpus — AQE broadcasts it
    * under the threshold; above it the join shuffles on the QI key, where
    * a dominant QI combination is exactly the skew AQE's skew-join
    * handles. The join is null-safe (`<=>` per QI column) so NULL-valued
    * classes rejoin their own count instead of silently losing it.
    */
  def kAnonymitySuppress(df: DataFrame, qiCols: Seq[String], k: Int)
      : DataFrame = {
    val classes = kAnonymityReport(df, qiCols, k)
      .withColumnRenamed("at_risk", "suppressed")
      // disambiguate join-key columns from df's own
      .select(qiCols.map(c => col(c).as(s"_qi_$c")) :+
        col("class_size") :+ col("suppressed"): _*)
    val cond = qiCols.map(c => col(c) <=> col(s"_qi_$c")).reduce(_ && _)
    val joined = df.join(classes, cond)
    val suppressedQis = qiCols.map(c =>
      when(col("suppressed"), lit(null)).otherwise(col(c)).as(c))
    val passthrough = df.columns.filterNot(qiCols.contains).map(col(_))
    joined.select(passthrough ++ suppressedQis :+
      col("class_size") :+ col("suppressed"): _*)
  }
}
