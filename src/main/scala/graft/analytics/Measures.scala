package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's 12 DAX measures (`DAX Measures Used.txt:1-68`) over the
  * star schema: filtered aggregates on `T_FACT_Events ⋈ T_DIM_Seismic_
  * Activity_Type`.
  *
  * Spark-first shape: the seven per-type counts (Q5–Q11) are one grouped
  * aggregate, not seven scans; the type dimension joins broadcast. Partial
  * (map-side) aggregation means shuffle volume is O(types), so these hold
  * unchanged at any fact scale.
  */
object Measures {

  /** Fact ⋈ type-dim, the base of Q2–Q11. */
  def withType(fact: DataFrame, typeDim: DataFrame): DataFrame =
    fact.join(broadcast(typeDim), Seq("ID_type_ID"), "left_outer")

  /** Q1 — Latest Daily Update. */
  def latestDailyUpdate(fact: DataFrame): DataFrame =
    fact.agg(max("_DT_insertion_date").as("latest_daily_update"))

  /** Q2/Q3/Q4 — avg magnitude, max depth, max magnitude of earthquakes. */
  def earthquakeStats(fact: DataFrame, typeDim: DataFrame): DataFrame =
    withType(fact, typeDim)
      .filter(col("LB_type") === "earthquake")
      .agg(
        avg("VL_n_mag").as("avg_earthquake_magnitude"),
        max("VL_n_depth").as("max_earthquake_depth"),
        max("VL_n_mag").as("max_earthquake_magnitude"))

  /** Q5–Q11 — the seven per-type totals, as one grouped count. */
  def totalsByType(fact: DataFrame, typeDim: DataFrame): DataFrame =
    withType(fact, typeDim)
      .groupBy(col("LB_type"))
      .agg(count(lit(1)).as("total_events"))

  /** Q12 — Total Seismic Events. */
  def totalSeismicEvents(fact: DataFrame): DataFrame =
    fact.agg(count(lit(1)).as("total_seismic_events"))
}
