package graft.ods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STG → ODS layer: typed casts, derived measures, categorization, stable
  * event key, Bucharest wall-clock time, audit columns.
  *
  * Reference behavior: `Full Load Scripts/ods_full_load2.py:47-137` and the
  * delta variant `Delta Load Scripts/ods_delta_load2.py`. Everything here is
  * a built-in column expression (whole-stage codegen; no UDFs), so Catalyst
  * is free to prune/push/pipeline it.
  */
object OdsTransform {

  /** P6 — `to_float` (`ods_full_load2.py:51-55`): parse-error and
    * `''|'null'` → NULL. `try_cast` gives exactly these semantics under
    * Spark 4's default ANSI mode (a plain cast would throw).
    */
  def toDouble(c: Column): Column = c.try_cast(DoubleType)

  /** P6 — `to_int` is `int(float(v))` (`ods_full_load2.py:57-61`): truncation
    * toward zero, so "12.7" → 12. Cast via double keeps that.
    */
  def toInt(c: Column): Column = c.try_cast(DoubleType).try_cast(IntegerType)

  /** P6 — `clean` (`ods_full_load2.py:63-64`): `''|'null'` → NULL. */
  def clean(c: Column): Column =
    when(c.isin("", "null"), lit(null).cast(StringType)).otherwise(c)

  /** P7 — derived measure `v + 0.5*err`, falling back to `v` when the error
    * term is NULL (`ods_full_load2.py:75-76`).
    */
  def derived(v: Column, err: Column): Column =
    when(v.isNotNull && err.isNotNull, v + lit(0.5) * err).otherwise(v)

  /** P8 — depth buckets: ≤70 Shallow, ≤300 Intermediate, else Deep
    * (`ods_full_load2.py:79-86`). NULL in → NULL out.
    */
  def depthCategory(d: Column): Column =
    when(d.isNull, lit(null).cast(StringType))
      .when(d <= 70, "Shallow")
      .when(d <= 300, "Intermediate")
      .otherwise("Deep")

  /** P8 — magnitude buckets, 7 classes (`ods_full_load2.py:88-103`). */
  def magCategory(m: Column): Column =
    when(m.isNull, lit(null).cast(StringType))
      .when(m < 3, "Not Felt")
      .when(m < 4, "Minor")
      .when(m < 5, "Light")
      .when(m < 6, "Moderate")
      .when(m < 7, "Strong")
      .when(m < 8, "Major")
      .otherwise("Great")

  /** P9 — ISO-8601 UTC instant → Europe/Bucharest wall-clock string,
    * DST-aware (`Delta Load Scripts/ods_delta_load2.py:26-33`; the full-load
    * fixed "+3h" at `ods_full_load2.py:39-45` is a reference bug we
    * deliberately do not reproduce — documented divergence, SURVEY §7.4).
    * Unparseable input → NULL, like the reference's `except: return None`.
    */
  def eestTime(isoUtc: Column): Column =
    date_format(from_utc_timestamp(isoUtc.try_cast(TimestampType), "Europe/Bucharest"),
      "yyyy-MM-dd HH:mm:ss")

  /** P10 — stable 63-bit event key:
    * `int(sha1(f"{t}_{lat}_{lon}").hexdigest()[:16], 16) & 0x7FFF...F`
    * (`Delta Load Scripts/ods_delta_load2.py:18-24`). Used for BOTH load
    * paths — the full-load `abs(hash(...))` (`ods_full_load2.py:112`) is
    * process-seeded and unreproducible by design (SURVEY §7.4.1).
    *
    * Native expression chain: sha1 → first 16 hex chars → signed 64-bit parse
    * (`conv(..., 16, -10)`) → mask to 63 bits. The mask operates on the bit
    * pattern, so signed parse + AND equals Python's unsigned parse + AND.
    * Python formats None as "None" inside the f-string; `concat_ws` would
    * drop nulls, hence the coalesce.
    */
  def stableId(time: Column, lat: Column, lon: Column): Column = {
    val key = concat_ws("_",
      coalesce(time.cast(StringType), lit("None")),
      coalesce(lat.cast(StringType), lit("None")),
      coalesce(lon.cast(StringType), lit("None")))
    conv(substring(sha1(key), 1, 16), 16, -10).cast(LongType)
      .bitwiseAND(lit(Long.MaxValue))
  }

  /** STG → ODS projection (`ods_full_load2.py:111-137`).
    *
    * @param insertionTs naive Bucharest wall-clock timestamp for the audit
    *                    columns (reference: `datetime.now(utc).astimezone(eest)`)
    */
  def toOds(stg: DataFrame, insertionTs: java.sql.Timestamp): DataFrame = {
    val lat = toDouble(col("latitude"))
    val lon = toDouble(col("longitude"))
    val depth = toDouble(col("depth"))
    val depthErr = toDouble(col("depthError"))
    val mag = toDouble(col("mag"))
    val magErr = toDouble(col("magError"))
    val vlNDepth = derived(depth, depthErr)
    val vlNMag = derived(mag, magErr)
    val dtTime = eestTime(col("time"))
    stg.select(
      stableId(dtTime, col("latitude"), col("longitude")).as("ID_Event"),
      vlNMag.as("VL_n_mag"),
      magCategory(vlNMag).as("LB_magCategory"),
      vlNDepth.as("VL_n_depth"),
      depthCategory(vlNDepth).as("LB_depthCategory"),
      lit(null).cast(StringType).as("LB_Region"),
      lit(null).cast(StringType).as("LB_Country"),
      clean(col("place")).as("LB_place"),
      dtTime.as("DT_time"),
      lat.as("VL_latitude"),
      lon.as("VL_longitude"),
      toInt(col("nst")).as("ID_nst"),
      toInt(col("gap")).as("ID_gap"),
      toDouble(col("dmin")).as("VL_dmin"),
      clean(col("net")).as("LB_net"),
      clean(col("type")).as("LB_type"),
      toDouble(col("horizontalError")).as("VL_horizontalError"),
      toInt(col("magNst")).as("ID_magNst"),
      clean(col("status")).as("LB_status"),
      clean(col("locationSource")).as("LB_locationSource"),
      clean(col("magSource")).as("LB_magSource"),
      lit(insertionTs).as("_DT_insertion_date"),
      lit(null).cast(TimestampType).as("_DT_updated_date"),
      clean(col("job_execution_id")).as("_LB_job_execution_id"),
      clean(col("data_source")).as("_LB_data_source"))
  }

  /** J3 — delta dedup: drop rows whose `ID_Event` already exists
    * (`Delta Load Scripts/ods_delta_load2.py:140-150,166-184`).
    *
    * The reference does O(existing) Python-list membership per row via an
    * `AsList` side input — a known scaling cliff. Here it is a left-anti
    * join: broadcast when the existing-key set is small, shuffled hash
    * otherwise; either way O(n) total and cluster-parallel.
    */
  def dedupeAgainstExisting(fresh: DataFrame, existingKeys: DataFrame,
      key: String = "ID_Event"): DataFrame =
    fresh.join(existingKeys.select(key), Seq(key), "left_anti")
}
