package graft.ods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** ODS place-string → (LB_Region, LB_Country) enrichment.
  *
  * Reference behavior: `Full Load Scripts/parse_country_ods_full_load2.py:36-76`
  * (delta copy `Delta Load Scripts/parse_country_ods_delta_load2.py:40-79`):
  *   - NULL/empty place → both NULL
  *   - no comma → whole trimmed string is the Region, Country NULL
  *   - else split on the LAST comma; the right side is looked up in the
  *     US-states map (keyed by both full name and abbreviation,
  *     `parse_country_ods_full_load2.py:97-100`); a hit → (state name, "USA");
  *     a miss → Region = text after the first "of " in the left side (case-
  *     insensitive, `re.search(r"of\s+(.+)$")`) or the whole left side, and
  *     Country = the right side.
  *
  * Spark-first shape: pure column expressions (P11) plus one broadcast
  * left-outer join against the doubled-key lookup (J2) — no UDF, fully
  * codegen'd, and the lookup stays a broadcast at any fact size because the
  * dimension is bounded (50 states × 2 keys).
  */
object PlaceParser {

  /** J2 — flat-map the states table to {name→name, abbreviation→name}. */
  def statesLookup(states: DataFrame): DataFrame = {
    val byName = states.select(trim(col("State")).as("_state_key"), col("State").as("_state_name"))
    val byAbbr = states.select(trim(col("Abbreviation")).as("_state_key"), col("State").as("_state_name"))
    byName.unionByName(byAbbr)
  }

  /** P11 as a reusable pair of expressions, given the join-resolved state
    * name column (`stateName` is NULL on lookup miss).
    */
  def regionExpr(place: Column, stateName: Column): Column = {
    val hasComma = place.contains(",")
    val left = trim(regexp_extract(place, "^(.*),[^,]*$", 1))
    val afterOf = regexp_extract(left, "(?i)of\\s+(.+)$", 1)
    val rr = when(length(afterOf) > 0, trim(afterOf)).otherwise(left)
    when(place.isNull || place === "", lit(null).cast(StringType))
      .when(!hasComma, trim(place))
      .when(stateName.isNotNull, stateName)
      .otherwise(rr)
  }

  def countryExpr(place: Column, stateName: Column): Column = {
    val hasComma = place.contains(",")
    val rl = trim(substring_index(place, ",", -1))
    when(place.isNull || place === "" || !hasComma, lit(null).cast(StringType))
      .when(stateName.isNotNull, "USA")
      .otherwise(rl)
  }

  /** Enrich an ODS frame: parse `LB_place`, fill `LB_Region`/`LB_Country`,
    * refresh `_DT_insertion_date` (the reference re-stamps it here,
    * `parse_country_ods_full_load2.py:45`).
    */
  def parsePlaces(ods: DataFrame, states: DataFrame,
      insertionTs: java.sql.Timestamp): DataFrame = {
    val lookup = statesLookup(states)
    val place = col("LB_place")
    // join key: candidate US-state token (text after the last comma); only
    // defined when a comma exists so no-comma rows can't match
    val candidate = when(place.contains(","), trim(substring_index(place, ",", -1)))
    val joined = ods
      .withColumn("_state_candidate", candidate)
      .join(broadcast(lookup), col("_state_candidate") === col("_state_key"), "left_outer")
    val ordered = ods.columns.map {
      case "LB_Region" => regionExpr(place, col("_state_name")).as("LB_Region")
      case "LB_Country" => countryExpr(place, col("_state_name")).as("LB_Country")
      case "_DT_insertion_date" => lit(insertionTs).as("_DT_insertion_date")
      case other => col(other)
    }
    joined.select(ordered.toIndexedSeq: _*)
  }
}
