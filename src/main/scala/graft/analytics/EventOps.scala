package graft.analytics

import graft.util.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators beyond the reference's aggregate
  * surface: gap-based sessionization and as-of (most-recent-prior) joins —
  * the two classic time-ordered operations a behavioral/training-data
  * pipeline needs over an events table.
  *
  * Scale shape: both are single-shuffle operators — one hash exchange on
  * the entity key, then per-partition sorted windows; no self-joins, no
  * range explosion. Session aggregates use decimal-exact sums so results
  * are partitioning-invariant.
  */
object EventOps {

  /** Epoch micros robust to the input's timestamp flavor. `unix_micros`
    * rejects `TIMESTAMP_NTZ` outright (DATATYPE_MISMATCH at analysis — the
    * driver's parquet testdata switched `events.ts` to NTZ and silently
    * dropped sessionize/rangeJoin from a whole verification round). The
    * cast is a no-op on `TIMESTAMP` and maps NTZ wall-clock through the
    * session TZ; with the session pinned to UTC (GraftSession/Verify/Bench)
    * that is the same instant a naive `epoch_us` computes, so gap and grain
    * arithmetic is unchanged either way.
    */
  private def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event of the same entity exceeds `gapSeconds`. Returns
    * one row per session: (entity, session_id ordinal, n_events,
    * session_start, session_end, total `valueCol`).
    *
    * Classic two-window formulation: boundary flag via `lag`, session id
    * via running sum — both over the same (entity, time, id) sort, so
    * Catalyst plans a single exchange + sort.
    */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
      idCol: String, valueCol: String, gapSeconds: Long): DataFrame = {
    val order = Seq(col(tsCol).asc, col(idCol).asc)
    val w = Window.partitionBy(col(entityCol)).orderBy(order: _*)
    val gapUs = gapSeconds * 1000000L
    val prevTs = lag(col(tsCol), 1).over(w)
    val boundary = when(prevTs.isNull ||
      epochUs(col(tsCol)) - epochUs(prevTs) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("_new", boundary)
      .withColumn("session_id", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entityCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        Exact.dsum(col(valueCol)).as("total_value"))
  }

  /** Range (interval-containment) join: each point row is matched to every
    * interval of the same entity with `start <= ts <= end`.
    *
    * A naive theta join (`ts BETWEEN start AND end`) plans as a nested-loop
    * join — quadratic per entity and no partitioning helps. The scale-safe
    * shape used here is grain bucketing: every interval explodes to the
    * coarse time grains it spans, points bucket to their grain, and the
    * match becomes an equi-join on (entity, grain) with a residual
    * containment filter. Join fan-out is bounded by interval-span/grain,
    * chosen by the caller to match interval length.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, entityCol: String,
      tsCol: String, startCol: String, endCol: String,
      grainSeconds: Long): DataFrame = {
    val gUs = grainSeconds * 1000000L
    val p = points.withColumn("_grain", epochUs(col(tsCol)).divide(gUs).cast("long"))
    val iv = intervals
      .withColumn("_grain", explode(sequence(
        (epochUs(col(startCol)) / gUs).cast("long"),
        (epochUs(col(endCol)) / gUs).cast("long"))))
      .withColumnRenamed(entityCol, "_ent")
    p.join(iv, col(entityCol) === col("_ent") && p("_grain") === iv("_grain"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_grain", "_ent")
  }

  /** As-of join: each `left` row is matched to the single most recent
    * `right` row of the same entity with `right.ts <= left.ts` (ties on
    * the right's timestamp resolved toward the larger id, so the result is
    * deterministic).
    *
    * Spark has no native as-of join; the union-tag formulation turns it
    * into one window pass — interleave both streams sorted by
    * (entity, ts, side, id) with the right side ordered first at equal
    * timestamps, and carry the last right-side payload forward with
    * `last(..., ignoreNulls)`. One shuffle on the entity key, never a
    * range-join explosion.
    */
  def asofJoin(left: DataFrame, right: DataFrame, entityCol: String,
      tsCol: String, idCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns
    val l = left.select(leftCols.map(col) :+ lit(1).as("_side"): _*)
    val r = right.select(
      Seq(col(entityCol), col(tsCol), col(idCol), lit(0).as("_side")) ++
        payloadCols.map(c => col(c).as(s"_p_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col("_side").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry ONE struct of all payload columns, not each column separately:
    // a per-column last(..., ignoreNulls) would skip a matched row whose
    // payload value is NULL (silently reading it from an older row, and
    // different columns from different rows). The struct is non-null for
    // every right row, so all payload fields come from the single most
    // recent prior row and its NULL fields stay NULL.
    val payloadStruct = struct(payloadCols.map(c => col(s"_p_$c")): _*)
    val carried = unioned.withColumn("_asof_row",
      last(when(col("_side") === 0, payloadStruct), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c =>
        col("_asof_row").getField(s"_p_$c").as(s"$outPrefix$c")): _*)
  }

  /** Last-touch attribution: each conversion event is credited to the
    * most recent preceding touch event (of a qualifying type, same
    * entity) within `windowSec` — the standard marketing/behavioral
    * attribution rule, and in a training-data setting the "which probe
    * preceded this outcome" query. Built on [[asofJoin]] (the touch
    * stream is the right side; matches beyond the window are nulled, not
    * dropped — verdict-not-filter, unattributed conversions stay
    * visible). One row per conversion: the conversion's own columns plus
    * `touch_type`, `touch_id`, `touch_ts` (all null when unattributed).
    * Ties at the same timestamp resolve toward the larger touch id, the
    * [[asofJoin]] rule.
    *
    * Scale shape: inherits [[asofJoin]]'s single entity-keyed exchange +
    * one window pass; the window test is per-row epoch arithmetic.
    */
  def lastTouchAttribution(events: DataFrame, entityCol: String,
      tsCol: String, idCol: String, typeCol: String, valueCol: String,
      conversionType: String, touchTypes: Seq[String],
      windowSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(conversionType),
      "the conversion type cannot also be a touch type")
    require(windowSec > 0, "need windowSec > 0")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(idCol), col(entityCol), col(tsCol), col(valueCol))
    val tch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(entityCol), col(tsCol), col(idCol), col(typeCol))
    val matched = asofJoin(conv, tch, entityCol, tsCol, idCol,
      payloadCols = Seq(typeCol, tsCol, idCol), outPrefix = "_t_")
    val inWin = col(s"_t_$tsCol").isNotNull &&
      epochUs(col(s"_t_$tsCol")) >=
        epochUs(col(tsCol)) - windowSec * 1000000L
    matched.select(col(idCol), col(entityCol), col(tsCol), col(valueCol),
      when(inWin, col(s"_t_$typeCol")).as("touch_type"),
      when(inWin, col(s"_t_$idCol")).as("touch_id"),
      when(inWin, col(s"_t_$tsCol")).as("touch_ts"))
  }

  /** Ordered funnel: for each entity that performed `steps.head`, the
    * EARLIEST completion chain — `t1` = first occurrence of step 1,
    * `t(i)` = first occurrence of step i STRICTLY after `t(i-1)` (the
    * standard earliest-conversion semantics; a broken chain leaves the
    * remaining steps null, and `steps_completed` counts the prefix that
    * matched). One row per entity with `t1..tN` timestamps.
    *
    * Deliberately the min-chain formulation, not a per-entity sorted
    * replay: each step is one filtered `(entity → min ts)` aggregate with
    * map-side combine joined back on the entity key — |steps| compact
    * hash exchanges, no per-entity buffering, no window sort, and a step
    * whose events are skewed onto one entity still partial-aggregates
    * flat. A null `t(i-1)` nulls the join condition, so breaks propagate
    * without special-casing.
    */
  def funnel(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val s0 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("t1"))
    val chained = steps.tail.zipWithIndex.foldLeft(s0) {
      case (acc, (step, i)) =>
        val prevC = s"t${i + 1}"
        val curC = s"t${i + 2}"
        val nxt = events.filter(col(typeCol) === step)
          .select(col(entityCol).as("_e"), col(tsCol).as("_ts"))
        val keep = acc.columns
        acc.join(nxt,
            acc(entityCol) === nxt("_e") && nxt("_ts") > acc(prevC), "left")
          .groupBy(keep.map(acc(_)): _*)
          .agg(min(col("_ts")).as(curC))
    }
    val completed = (2 to steps.size).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"t$i").isNotNull, 1).otherwise(0)
    }
    chained.withColumn("steps_completed", completed.cast("int"))
  }

  /** Retention cohorts: users bucketed by the `bucketDays`-day index of
    * their FIRST event (cohort), counted once per (cohort, age) cell where
    * age = activity bucket − cohort bucket. Bucket indices are exact
    * integer day arithmetic from `anchorDate` — engine-agnostic, unlike
    * week truncation whose anchor varies. Output: (`cohort_bucket`,
    * `bucket_age`, `n_active`), the classic retention triangle.
    *
    * Scale shape: distinct (entity, bucket) activity + per-entity min —
    * both entity-keyed aggregates with map-side combine — joined on the
    * entity, then one tiny (cohort, age) count. Nothing corpus-wide.
    */
  def retentionCohorts(events: DataFrame, entityCol: String, tsCol: String,
      anchorDate: String, bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, "need bucketDays > 0")
    val bucket = floor(
      datediff(col(tsCol).cast("date"), to_date(lit(anchorDate)))
        / bucketDays).cast("long")
    val activity = events
      .select(col(entityCol).as("_e"), bucket.as("_b")).distinct()
    val cohorts = activity.groupBy(col("_e")).agg(min(col("_b")).as("_c"))
    activity.join(cohorts, Seq("_e"))
      .groupBy(col("_c").as("cohort_bucket"),
        (col("_b") - col("_c")).as("bucket_age"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Event-rate anomaly detection: per (type, day), flag days whose event
    * count exceeds `factorNum/factorDen` times the trailing `windowDays`-
    * day mean — the ops alarm for ingestion spikes, bot bursts, and
    * broken instrumentation. The verdict is the exact integer comparison
    * `n·windowDays·factorDen > trailing_sum·factorNum` (no float mean);
    * `trailing_mean` rides along as one IEEE division. Days with fewer
    * than `windowDays` PRIOR CALENDAR days of history (including gap days,
    * which count as zero — a spike after silence is still a spike) report
    * a null verdict: no baseline, not "normal". One row per observed
    * (type, day).
    *
    * Scale shape: one (type, day)-keyed count with map-side combine (the
    * only corpus-sized pass), then a per-type RANGE window over day
    * numbers — group size is bounded by the calendar, not the corpus, so
    * the per-type window task is days-sized.
    */
  def rateAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      windowDays: Int, factorNum: Long, factorDen: Long): DataFrame =
    rateAnomaliesFromDaily(dailyCounts(events, typeCol, tsCol),
      windowDays, factorNum, factorDen)

  /** Per-(type, epoch-day) event counts — ADDITIVE on disjoint event
    * batches (aggregate of a pure per-row key), so a monitoring pipeline
    * maintains them per batch and re-scores from counts alone.
    */
  def dailyCounts(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame =
    events
      .select(col(typeCol).as("event_type"),
        datediff(col(tsCol).cast("date"),
          to_date(lit("1970-01-01"))).cast("long").as("_day"))
      .groupBy(col("event_type"), col("_day"))
      .agg(count(lit(1)).as("n"))

  /** [[rateAnomalies]] from a pre-aggregated [[dailyCounts]] table — the
    * maintained/streaming entry point.
    */
  def rateAnomaliesFromDaily(daily: DataFrame, windowDays: Int,
      factorNum: Long, factorDen: Long): DataFrame = {
    require(windowDays > 0, "need windowDays > 0")
    require(factorNum > 0 && factorDen > 0, "need a positive spike factor")
    // RANGE frame over the day NUMBER: gap days contribute nothing to the
    // sum (= zero events) but still age the frame — calendar semantics
    val w = Window.partitionBy(col("event_type")).orderBy(col("_day"))
      .rangeBetween(-windowDays, -1)
    val first = Window.partitionBy(col("event_type"))
    daily
      .withColumn("_tsum", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("_hist", col("_day") - min(col("_day")).over(first))
      .select(col("event_type"),
        // yyyy-MM-dd STRING, not DATE: date columns round-trip through
        // parquet/pandas with engine-specific physical types and fail
        // exact compares; the string form is unambiguous everywhere
        date_format(date_add(to_date(lit("1970-01-01")),
          col("_day").cast("int")), "yyyy-MM-dd").as("day"),
        col("n"),
        when(col("_hist") >= windowDays,
          col("_tsum").cast("double") / windowDays).as("trailing_mean"),
        when(col("_hist") >= windowDays,
          col("n") * windowDays * factorDen > col("_tsum") * factorNum)
          .as("spike"))
  }
}
