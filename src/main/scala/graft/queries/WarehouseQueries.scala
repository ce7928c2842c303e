package graft.queries

import graft.dw.{Bucketed, DateDim, DimBuilder, Merge}
import graft.ingest.Staging
import graft.ods.{OdsTransform, PlaceParser}
import graft.util.{Exact, Tables}
import org.apache.spark.sql.functions._

/** Operator-parity queries for the warehouse layers (SURVEY §2), each
  * exercising the corresponding library module over the driver's tables,
  * each with a DuckDB oracle.
  *
  * Naming: `<§2 id>_<name>` so the inventory can be checked line by line.
  */
object WarehouseQueries {

  /** DuckDB-side decimal→bigint hex parse (DuckDB 1.0 has no conv()):
    * polynomial over the first `n` hex chars. Exact for n ≤ 15 (< 2^60).
    */
  private def duckHexToLong(hexExpr: String, n: Int = 15): String =
    (1 to n).map { i =>
      val pow = java.math.BigInteger.valueOf(16L).pow(n - i)
      s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * CAST('$pow' AS BIGINT)"
    }.mkString("(", " + ", ")")

  val all: Map[String, Q] = Map(
    // W1/A1 — distinct → dense sorted surrogate ids (DimBuilder)
    "w1_dim_surrogate" -> ((s, dir) => {
      DimBuilder.build(Tables(s, dir, "events"), Seq(col("event_type")),
        Seq("LB_type"), "ID_type_ID").orderBy("ID_type_ID")
    }),

    // A2 — composite-key dimension
    "a2_dim_composite" -> ((s, dir) => {
      DimBuilder.build(Tables(s, dir, "documents"), Seq(col("lang"), col("source")),
        Seq("LB_lang", "LB_source"), "ID_ls_ID").orderBy("ID_ls_ID")
    }),

    // J4/W1 — delta dim extension: new values only, ids continue from max
    "j4_dim_extend" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val existingSrc = orders.filter(col("o_orderkey") % 2 === 0 &&
        !col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      val existing = DimBuilder.build(existingSrc, Seq(col("o_orderpriority")),
        Seq("LB_priority"), "ID_priority")
      DimBuilder.extend(existing, orders, Seq(col("o_orderpriority")),
        Seq("LB_priority"), "ID_priority").orderBy("ID_priority")
    }),

    // P12 — date dimension attributes (ISO week / ISO day-of-week)
    "p12_date_dim" -> ((s, dir) => {
      DateDim.build(Tables(s, dir, "orders"), col("o_orderdate")).orderBy("ID_date_ID")
    }),

    // P14/J1 — fact enrichment: broadcast dim join + date key derivation
    "p14_fact_enrich" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val dim = DimBuilder.build(ev, Seq(col("event_type")), Seq("LB_type"), "ID_type_ID")
      ev.join(broadcast(dim), col("event_type") === col("LB_type"))
        .select(col("event_id").as("ID_Event"), col("ID_type_ID"),
          date_format(col("ts"), "yyyyMMdd").cast("int").as("ID_date_ID"),
          col("value").as("VL_value"))
        .orderBy("ID_Event")
    }),

    // K5/J5 — MERGE upsert as left-anti + union
    "k5_merge_upsert" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val existing = o.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val staged = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("M").as("o_orderstatus"))
      Merge.upsert(existing, staged, "o_orderkey").orderBy("o_orderkey")
    }),

    // K5 over BUCKETED storage — the co-located MERGE that keeps the big
    // (existing) side exchange-free at warehouse scale: both sides are
    // written bucketed on the key, the upsert join reads buckets pairwise,
    // and the result swaps in via metastore rename. Oracle = the plain
    // MERGE semantics (same as k5) — storage layout must not change the
    // answer.
    "k5b_merge_bucketed" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val existing = o.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val staged = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("M").as("o_orderstatus"))
      val table = "k5b_fact"
      Bucketed.writeBucketed(existing, table, "o_orderkey", buckets = 8)
      Bucketed.mergeIntoBucketed(s, table, staged, "o_orderkey", buckets = 8)
      s.table(table).orderBy("o_orderkey")
    }),

    // J3 — anti-join dedup/exclusion
    "j3_anti_join" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val building = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      orders.join(building, orders("o_custkey") === building("c_custkey"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey")).orderBy("o_orderkey")
    }),

    // S6 + J1 — literal dim, null-safe broadcast left-outer join
    "s6_nullsafe_join" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("click", "Clicked"), (null.asInstanceOf[String], "NoKey"))
        .toDF("k", "label")
      val ev = Tables(s, dir, "events")
        .withColumn("k2", nullif(col("event_type"), lit("error")))
      ev.join(broadcast(dim), col("k2") <=> dim("k"), "left_outer")
        .select(col("event_id"), col("label")).orderBy("event_id")
    }),

    // J1 — broadcast equi-join + grouped exact aggregate
    "j1_broadcast_join" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("p_brand")
    }),

    // P2/P5 — null normalization ('', '0' → NULL) over a derived raw column
    "p2_null_normalize" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val raw = when(col("user_id") % 7 === 0, lit("0"))
        .when(col("user_id") % 11 === 0, lit(""))
        .otherwise(col("props"))
      Staging.normalizeNulls(ev.select(col("event_id"), raw.as("props_clean")),
        Seq("props_clean")).orderBy("event_id")
    }),

    // P3 — type-gated DQ filter (accepted channel)
    "p3_dq_filter" -> ((s, dir) => {
      val bad = col("event_type") === "error" && (col("value") < 1 || col("value") > 400)
      Tables(s, dir, "events").filter(!bad)
        .select(col("event_id"), col("event_type"), col("value")).orderBy("event_id")
    }),

    // P7 — derived measure with null fallback
    "p7_derived_measure" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val err = when(col("user_id") % 5 === 0, lit(null).cast("double"))
        .otherwise(col("value") / 10)
      ev.select(col("event_id"), OdsTransform.derived(col("value"), err).as("vl_n"))
        .orderBy("event_id")
    }),

    // P8 — CASE bucketing (depth + magnitude chains)
    "p8_bucketing" -> ((s, dir) => {
      Tables(s, dir, "events").select(col("event_id"),
        OdsTransform.depthCategory(col("value")).as("depth_cat"),
        OdsTransform.magCategory(col("value") / lit(50.0)).as("mag_cat"))
        .orderBy("event_id")
    }),

    // P10 — stable 63-bit hash key (md5 variant: DuckDB 1.0 lacks sha1;
    // the sha1 production path is unit-tested against reference vectors)
    "p10_stable_key" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val key = concat_ws("_", col("l_orderkey"), col("l_linenumber"))
      li.select(col("l_orderkey"), col("l_linenumber"),
        conv(substring(md5(key), 1, 15), 16, 10).cast("long").as("stable_key"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P11/J2 — place parser over synthesized place strings + states lookup
    "p11_place_parse" -> ((s, dir) => {
      import s.implicits._
      val states = Seq(("California", "CA"), ("Alaska", "AK")).toDF("State", "Abbreviation")
      val place = when(col("user_id") % 4 === 0, concat(col("event_type"), lit(" region")))
        .when(col("user_id") % 4 === 1, concat(lit("10km SW of "), col("event_type"), lit(", CA")))
        .when(col("user_id") % 4 === 2, concat(lit("north of "), col("event_type"), lit(", Japan")))
        .otherwise(lit(null).cast("string"))
      val ev = Tables(s, dir, "events").select(col("event_id"), place.as("place"))
      val lookup = PlaceParser.statesLookup(states)
      val candidate = when(col("place").contains(","), trim(substring_index(col("place"), ",", -1)))
      ev.withColumn("_c", candidate)
        .join(broadcast(lookup), col("_c") === col("_state_key"), "left_outer")
        .select(col("event_id"),
          PlaceParser.regionExpr(col("place"), col("_state_name")).as("region"),
          PlaceParser.countryExpr(col("place"), col("_state_name")).as("country"))
        .orderBy("event_id")
    }),

    // U1 — union of conformed projections
    "u1_union" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_name").as("name"), lit("customer").as("src"))
      val sup = Tables(s, dir, "supplier")
        .select(col("s_name").as("name"), lit("supplier").as("src"))
      c.unionByName(sup).orderBy("name", "src")
    }),

    // A4 — scalar max / distinct count
    "a4_max_scalar" -> ((s, dir) => {
      Tables(s, dir, "orders").agg(
        max(col("o_orderkey")).as("max_key"),
        max(col("o_orderdate")).as("max_date"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
    }),

    // DAX Q2-Q11 — per-type filtered aggregates over the fact stream
    "dax_by_type" -> ((s, dir) => {
      Tables(s, dir, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("total_events"),
          max(col("value")).as("max_value"),
          Exact.davg(col("value")).as("avg_value"))
        .orderBy("event_type")
    }),

    // DAX Q2-Q4 — filtered single-type stats (avg magnitude analogue,
    // max depth/magnitude analogue) over the fact stream
    "dax_eq_stats" -> ((s, dir) => {
      val events = Tables(s, dir, "events")
      // NULLs out: Spark sorts NULLS FIRST while the oracle's min() skips
      // them — filter so both sides agree on the smallest non-null type.
      val t = events.select(col("event_type")).filter(col("event_type").isNotNull)
        .orderBy("event_type").limit(1)
      events.join(broadcast(t), Seq("event_type"))
        .agg(Exact.davg(col("value")).as("avg_value"),
          max(col("value")).as("max_value"),
          count(lit(1)).as("n_events"))
    }),

    // deterministic salted join: the hot-key skew lever (5 event types ×
    // 20k rows each) — result provably identical to the plain equi-join
    "x32_salted_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val dim = DimBuilder.build(ev, Seq(col("event_type")), Seq("LB_type"), "ID_type_ID")
        .select(col("LB_type").as("event_type"), col("ID_type_ID"))
      graft.util.Skew.saltedJoin(
        ev.select(col("event_id"), col("event_type"), col("value")),
        dim, keys = Seq("event_type"), salt = 8)
        .groupBy(col("ID_type_ID"), col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("total_value"))
        .orderBy("ID_type_ID")
    }),

    // gap-based sessionization: 30-min inactivity splits, decimal-exact sums
    "x23_sessionize" -> ((s, dir) => {
      graft.analytics.EventOps.sessionize(Tables(s, dir, "events"),
        "user_id", "ts", "event_id", "value", gapSeconds = 1800)
        .orderBy("user_id", "session_id")
    }),

    // as-of join: each purchase matched to the latest prior view per user
    "x24_asof_join" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = e.filter(col("event_type") === "view" && col("value").isNotNull)
        .select("user_id", "ts", "event_id", "value")
      graft.analytics.EventOps.asofJoin(purchases, views,
        "user_id", "ts", "event_id", Seq("value"), "view_")
        .orderBy("event_id")
    }),

    // event-rate anomaly detection: per (type, day), spike = count > 1.5×
    // the trailing 7-day mean (exact integer verdict); first week of each
    // type's history reports null — no baseline, not "normal"
    "x113_rate_anomaly" -> ((s, dir) => {
      graft.analytics.EventOps.rateAnomalies(Tables(s, dir, "events"),
        "event_type", "ts", windowDays = 7, factorNum = 3, factorDen = 2)
        .orderBy("event_type", "day")
    }),

    // last-touch attribution: each purchase credited to the latest
    // click/view of the same user within 1 hour; unattributed purchases
    // stay visible with null touch columns
    "x103_last_touch" -> ((s, dir) => {
      graft.analytics.EventOps.lastTouchAttribution(Tables(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", "value",
        conversionType = "purchase", touchTypes = Seq("click", "view"),
        windowSec = 3600)
        .orderBy("event_id")
    }),

    // range join: events to their containing session interval, via grain
    // bucketing (equi-join + residual filter, not a nested-loop theta join)
    "x25_range_join" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val sessions = graft.analytics.EventOps.sessionize(e,
        "user_id", "ts", "event_id", "value", gapSeconds = 1800)
        .select(col("user_id"), col("session_id"),
          col("session_start"), col("session_end"))
      graft.analytics.EventOps.rangeJoin(
        e.select(col("event_id"), col("user_id"), col("ts")), sessions,
        "user_id", "ts", "session_start", "session_end", grainSeconds = 3600)
        .select(col("event_id"), col("user_id"), col("session_id"))
        .orderBy("event_id", "session_id")
    }),

    // ordered funnel view→click→purchase: earliest-conversion min-chain,
    // one filtered entity-keyed aggregate per step, no per-user replay
    "x77_funnel" -> ((s, dir) => {
      graft.analytics.EventOps.funnel(Tables(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    // retention triangle: 7-day buckets from an anchor date, exact integer
    // day arithmetic (engine-agnostic, unlike week truncation)
    "x78_retention" -> ((s, dir) => {
      graft.analytics.EventOps.retentionCohorts(Tables(s, dir, "events"),
        "user_id", "ts", anchorDate = "2024-01-01", bucketDays = 7)
        .orderBy("cohort_bucket", "bucket_age")
    }),

    // schema-driven JSON column extraction + typed aggregation
    "x26_json_extract" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // DAX Q1/Q12 — latest update + total row count
    "dax_latest" -> ((s, dir) => {
      Tables(s, dir, "events").agg(
        max(col("ts")).as("latest_update"),
        count(lit(1)).as("total_seismic_events"))
    }))

  /** Shared sessionization CTEs (boundary flag + running session id) —
    * used by the x23 and x25 oracles.
    */
  private def sessionCoreSql: String =
    """o AS (SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |         THEN 1 ELSE 0 END AS nw
      |  FROM events),
      |s AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM o)""".stripMargin

  val oracle: Map[String, String] = Map(
    "w1_dim_surrogate" ->
      """SELECT row_number() OVER (ORDER BY LB_type NULLS FIRST) AS ID_type_ID, LB_type
        |FROM (SELECT DISTINCT event_type AS LB_type FROM events)
        |ORDER BY ID_type_ID""".stripMargin,

    "a2_dim_composite" ->
      """SELECT row_number() OVER (ORDER BY LB_lang NULLS FIRST, LB_source NULLS FIRST) AS ID_ls_ID,
        |       LB_lang, LB_source
        |FROM (SELECT DISTINCT lang AS LB_lang, source AS LB_source FROM documents)
        |ORDER BY ID_ls_ID""".stripMargin,

    "j4_dim_extend" ->
      """WITH existing AS (
        |  SELECT row_number() OVER (ORDER BY LB_priority NULLS FIRST) AS ID_priority, LB_priority
        |  FROM (SELECT DISTINCT o_orderpriority AS LB_priority FROM orders
        |        WHERE o_orderkey % 2 = 0 AND o_orderpriority NOT IN ('1-URGENT','2-HIGH'))),
        |fresh AS (
        |  SELECT DISTINCT o_orderpriority AS LB_priority FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM existing e
        |                    WHERE e.LB_priority IS NOT DISTINCT FROM o.o_orderpriority))
        |SELECT (SELECT coalesce(max(ID_priority), 0) FROM existing)
        |       + row_number() OVER (ORDER BY LB_priority NULLS FIRST) AS ID_priority, LB_priority
        |FROM fresh ORDER BY ID_priority""".stripMargin,

    "p12_date_dim" ->
      """SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS ID_date_ID,
        |       strftime(d, '%Y-%m-%d') AS DT_date,
        |       dayname(d) AS LB_DayOfWeek,
        |       CAST(isodow(d) AS INT) AS ID_DayOfWeekNb,
        |       CAST(weekofyear(d) AS INT) AS ID_WeekNb,
        |       monthname(d) AS LB_MonthName,
        |       CAST(month(d) AS INT) AS ID_MonthNb,
        |       CAST(quarter(d) AS INT) AS ID_Quarter,
        |       CAST(year(d) AS INT) AS ID_Year
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
        |      WHERE o_orderdate IS NOT NULL)
        |ORDER BY ID_date_ID""".stripMargin,

    "p14_fact_enrich" ->
      """WITH dim AS (
        |  SELECT row_number() OVER (ORDER BY LB_type NULLS FIRST) AS ID_type_ID, LB_type
        |  FROM (SELECT DISTINCT event_type AS LB_type FROM events))
        |SELECT e.event_id AS ID_Event, d.ID_type_ID,
        |       CAST(strftime(e.ts, '%Y%m%d') AS INT) AS ID_date_ID,
        |       e.value AS VL_value
        |FROM events e JOIN dim d ON e.event_type = d.LB_type
        |ORDER BY ID_Event""".stripMargin,

    "k5_merge_upsert" ->
      """WITH existing AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0),
        |staged AS (SELECT o_orderkey, 'M' AS o_orderstatus FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT * FROM existing WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staged)
        |UNION ALL SELECT * FROM staged
        |ORDER BY o_orderkey""".stripMargin,

    "k5b_merge_bucketed" ->
      """WITH existing AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0),
        |staged AS (SELECT o_orderkey, 'M' AS o_orderstatus FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT * FROM existing WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staged)
        |UNION ALL SELECT * FROM staged
        |ORDER BY o_orderkey""".stripMargin,

    "j3_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "s6_nullsafe_join" ->
      """SELECT e.event_id, d.label
        |FROM events e
        |LEFT JOIN (VALUES ('click','Clicked'), (NULL,'NoKey')) AS d(k, label)
        |  ON nullif(e.event_type, 'error') IS NOT DISTINCT FROM d.k
        |ORDER BY event_id""".stripMargin,

    "j1_broadcast_join" ->
      s"""SELECT p_brand, count(*) AS n, ${Exact.dsumSql("l_extendedprice")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "p2_null_normalize" ->
      """SELECT event_id,
        |  CASE WHEN trim(r) IN ('', '0') THEN NULL ELSE trim(r) END AS props_clean
        |FROM (SELECT event_id,
        |        CASE WHEN user_id % 7 = 0 THEN '0'
        |             WHEN user_id % 11 = 0 THEN ''
        |             ELSE props END AS r
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    "p3_dq_filter" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE NOT (event_type = 'error' AND (value < 1 OR value > 400))
        |ORDER BY event_id""".stripMargin,

    "p7_derived_measure" ->
      """SELECT event_id,
        |  CASE WHEN value IS NOT NULL AND e IS NOT NULL THEN value + 0.5 * e ELSE value END AS vl_n
        |FROM (SELECT event_id, value,
        |        CASE WHEN user_id % 5 = 0 THEN NULL ELSE value / 10 END AS e
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    "p8_bucketing" ->
      """SELECT event_id,
        |  CASE WHEN value IS NULL THEN NULL
        |       WHEN value <= 70 THEN 'Shallow'
        |       WHEN value <= 300 THEN 'Intermediate'
        |       ELSE 'Deep' END AS depth_cat,
        |  CASE WHEN value IS NULL THEN NULL
        |       WHEN value / 50.0 < 3 THEN 'Not Felt'
        |       WHEN value / 50.0 < 4 THEN 'Minor'
        |       WHEN value / 50.0 < 5 THEN 'Light'
        |       WHEN value / 50.0 < 6 THEN 'Moderate'
        |       WHEN value / 50.0 < 7 THEN 'Strong'
        |       WHEN value / 50.0 < 8 THEN 'Major'
        |       ELSE 'Great' END AS mag_cat
        |FROM events ORDER BY event_id""".stripMargin,

    "p10_stable_key" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${duckHexToLong("md5(concat(l_orderkey, '_', l_linenumber))")} AS stable_key
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p11_place_parse" ->
      """WITH ev AS (
        |  SELECT event_id,
        |    CASE WHEN user_id % 4 = 0 THEN event_type || ' region'
        |         WHEN user_id % 4 = 1 THEN '10km SW of ' || event_type || ', CA'
        |         WHEN user_id % 4 = 2 THEN 'north of ' || event_type || ', Japan'
        |         ELSE NULL END AS place
        |  FROM events),
        |states(State, Abbreviation) AS (VALUES ('California','CA'), ('Alaska','AK')),
        |lk AS (SELECT trim(State) AS k, State AS v FROM states
        |       UNION ALL SELECT trim(Abbreviation), State FROM states),
        |j AS (
        |  SELECT ev.event_id, ev.place, lk.v AS state_name,
        |    trim(regexp_extract(place, '^(.*),[^,]*$', 1)) AS left_part
        |  FROM ev LEFT JOIN lk
        |    ON (CASE WHEN contains(place, ',')
        |             THEN trim(regexp_extract(place, ',([^,]*)$', 1)) END) = lk.k)
        |SELECT event_id,
        |  CASE WHEN place IS NULL OR place = '' THEN NULL
        |       WHEN NOT contains(place, ',') THEN trim(place)
        |       WHEN state_name IS NOT NULL THEN state_name
        |       WHEN regexp_extract(left_part, '(?i)of\s+(.+)$', 1) <> ''
        |         THEN trim(regexp_extract(left_part, '(?i)of\s+(.+)$', 1))
        |       ELSE left_part END AS region,
        |  CASE WHEN place IS NULL OR place = '' OR NOT contains(place, ',') THEN NULL
        |       WHEN state_name IS NOT NULL THEN 'USA'
        |       ELSE trim(regexp_extract(place, ',([^,]*)$', 1)) END AS country
        |FROM j ORDER BY event_id""".stripMargin,

    "u1_union" ->
      """SELECT c_name AS name, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS src FROM supplier
        |ORDER BY name, src""".stripMargin,

    "a4_max_scalar" ->
      """SELECT max(o_orderkey) AS max_key, max(o_orderdate) AS max_date,
        |       count(DISTINCT o_orderpriority) AS n_priorities
        |FROM orders""".stripMargin,

    "dax_by_type" ->
      s"""SELECT event_type, count(*) AS total_events, max(value) AS max_value,
         |       ${Exact.davgSql("value")} AS avg_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dax_eq_stats" ->
      s"""SELECT ${Exact.davgSql("value")} AS avg_value, max(value) AS max_value,
         |       count(*) AS n_events
         |FROM events
         |WHERE event_type = (SELECT min(event_type) FROM events)""".stripMargin,

    "x32_salted_join" ->
      s"""WITH dim AS (
         |  SELECT row_number() OVER (ORDER BY LB_type NULLS FIRST) AS ID_type_ID, LB_type
         |  FROM (SELECT DISTINCT event_type AS LB_type FROM events))
         |SELECT d.ID_type_ID, e.event_type, count(*) AS n,
         |       ${Exact.dsumSql("e.value")} AS total_value
         |FROM events e JOIN dim d ON e.event_type = d.LB_type
         |GROUP BY 1, 2 ORDER BY ID_type_ID""".stripMargin,

    "x23_sessionize" ->
      s"""WITH $sessionCoreSql
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  ${Exact.dsumSql("value")} AS total_value
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x25_range_join" ->
      s"""WITH $sessionCoreSql,
         |sess AS (SELECT user_id, session_id, min(ts) AS st, max(ts) AS en
         |         FROM s GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id, sess.session_id
         |FROM events e JOIN sess ON e.user_id = sess.user_id
         |  AND e.ts BETWEEN sess.st AND sess.en
         |ORDER BY event_id, session_id""".stripMargin,

    "x113_rate_anomaly" ->
      // RANGE frame over epoch-day numbers — gap days age the window but
      // add nothing, matching the Spark side's calendar semantics
      """WITH d AS (SELECT event_type,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
        |             count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |wnd AS (SELECT event_type, dn, n,
        |          sum(n) OVER (PARTITION BY event_type ORDER BY dn
        |            RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS tsum0,
        |          dn - min(dn) OVER (PARTITION BY event_type) AS hist
        |        FROM d)
        |SELECT event_type,
        |  strftime(DATE '1970-01-01' + CAST(dn AS INT), '%Y-%m-%d') AS day,
        |  CAST(n AS BIGINT) AS n,
        |  CASE WHEN hist >= 7
        |       THEN CAST(coalesce(tsum0, 0) AS DOUBLE) / 7 END AS trailing_mean,
        |  CASE WHEN hist >= 7
        |       THEN n * 7 * 2 > coalesce(tsum0, 0) * 3 END AS spike
        |FROM wnd ORDER BY event_type, day""".stripMargin,

    "x103_last_touch" ->
      // same ASOF + equal-ts dedup shape as x24; the window test mirrors
      // the Spark side's epoch arithmetic as interval arithmetic
      """WITH t AS (SELECT user_id, ts, event_id, event_type FROM events
        |           WHERE event_type IN ('click', 'view')
        |           QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  CASE WHEN t.ts >= p.ts - INTERVAL 3600 SECONDS THEN t.event_type END AS touch_type,
        |  CASE WHEN t.ts >= p.ts - INTERVAL 3600 SECONDS THEN t.event_id END AS touch_id,
        |  CASE WHEN t.ts >= p.ts - INTERVAL 3600 SECONDS THEN t.ts END AS touch_ts
        |FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND t.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "x24_asof_join" ->
      """WITH v AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'view' AND value IS NOT NULL
        |           QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.value, v.value AS view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "x77_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, s1.t1, min(e.ts) AS t2
        |       FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id
        |         AND e.event_type = 'click' AND e.ts > s1.t1
        |       GROUP BY 1, 2),
        |s3 AS (SELECT s2.user_id, s2.t1, s2.t2, min(e.ts) AS t3
        |       FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
        |         AND e.event_type = 'purchase' AND e.ts > s2.t2
        |       GROUP BY 1, 2, 3)
        |SELECT user_id, t1, t2, t3,
        |  CAST(1 + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS INT)
        |    AS steps_completed
        |FROM s3 ORDER BY user_id""".stripMargin,

    "x78_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    CAST(floor((CAST(ts AS DATE) - DATE '2024-01-01') / 7)
        |      AS BIGINT) AS b
        |  FROM events),
        |c AS (SELECT user_id, min(b) AS cb FROM a GROUP BY 1)
        |SELECT c.cb AS cohort_bucket, a.b - c.cb AS bucket_age,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x26_json_extract" ->
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dax_latest" ->
      """SELECT max(ts) AS latest_update, count(*) AS total_seismic_events
        |FROM events""".stripMargin)
}
