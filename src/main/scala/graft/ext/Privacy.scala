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

  /** t-closeness report (Li, Li & Venkatasubramanian ICDE 2007) — the
    * third privacy gate: l-diversity still discloses when a class's
    * sensitive-value DISTRIBUTION diverges from the corpus (a class that
    * is 90% one language in a 10% corpus narrows the attribute even with
    * many distinct values present). Per QI class: total-variation distance
    * between the class's and the corpus's sensitive distributions
    * (the equal-ground-distance Earth Mover's special case the paper
    * uses for categorical attributes), `at_risk` = (distance > t).
    *
    * Exactness: with class counts `c_v` (m = Σc_v) and corpus counts `g_v`
    * (N = Σg_v), TV = ½·Σ|c_v/m − g_v/N| = tv_num / (2mN) where
    * `tv_num = Σ_v |c_v·N − g_v·m|` is an EXACT long. Values absent from
    * the class contribute `g_v·m`, folded in without materializing the
    * absent set: Σ_absent g_v·m = m·(N − Σ_present g_v). The `at_risk`
    * verdict is the exact integer comparison `tv_num·tDen > 2·tNum·m·N`
    * (distance strictly exceeding t = tNum/tDen fails); `tv_distance` is
    * ONE IEEE division for the caller. NULL sensitive values carry no
    * distribution information and are excluded (matching
    * [[lDiversityReport]]'s countDistinct); a class with ONLY null
    * sensitive values reports null distance/verdict. Long caveat: exact
    * while c·N < 2⁶³ (N < ~3·10⁹ rows).
    *
    * Scale shape: two map-side-combined aggregates (class×value, value),
    * one value-keyed equi-join, a per-class window over ≤ |sensitive
    * domain| rows (bounded — not the per-group serialization hazard), one
    * class-keyed aggregate, and a null-safe join back to the full class
    * list. Output rows = QI cardinality, never corpus rows.
    */
  def tClosenessReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(tNum >= 0 && tDen > 0, "need t = tNum/tDen >= 0")
    val qi = qiCols.map(col)
    val nn = df.filter(col(sensitiveCol).isNotNull)
    val c = nn.groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("_c"))
    val g = nn.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("_g"))
    val nTot = g.agg(coalesce(sum(col("_g")), lit(0L)).as("_N"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qi: _*)
    val per = c.join(g, Seq(sensitiveCol))
      .crossJoin(broadcast(nTot))
      .withColumn("_m", sum(col("_c")).over(w))
      .groupBy(qi: _*)
      .agg(max(col("_m")).as("class_n"),
        sum(abs(col("_c") * col("_N") - col("_g") * col("_m"))).as("_present"),
        sum(col("_g")).as("_gsum"),
        max(col("_N")).as("_Nv"))
      .withColumn("tv_num",
        col("_present") + col("class_n") * (col("_Nv") - col("_gsum")))
    val base = df.groupBy(qi: _*).agg(count(lit(1)).as("class_size"))
    val cond = qiCols.map(n => col(s"_b.$n") <=> col(s"_t.$n")).reduce(_ && _)
    base.as("_b").join(per.as("_t"), cond, "left")
      .select(qiCols.map(n => col(s"_b.$n").as(n)) ++ Seq(
        col("class_size"), col("class_n"), col("tv_num"),
        (col("tv_num").cast("double") /
          (lit(2L) * col("class_n") * col("_Nv")).cast("double"))
          .as("tv_distance"),
        (col("tv_num") * tDen > lit(2L) * tNum * col("class_n") * col("_Nv"))
          .as("at_risk")): _*)
  }
}
