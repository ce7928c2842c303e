package graft.queries

import java.sql.Timestamp

import graft.analytics.Measures
import graft.dw.DimBuilder
import graft.pipeline.{DeltaLoad, FullLoad, Warehouse}
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-checked coverage of the reference's actual PIPELINE (not just its
  * operators): `e2e_full_load` synthesizes a deterministic USGS-format
  * landing CSV from the `events` table, runs the complete full-load chain
  * (`load_controller_DAG.py:187`: RAW → STG → ODS → place parse → star
  * schema → archive) through [[graft.pipeline.FullLoad]], and returns the
  * fact table; the DuckDB oracle recomputes the same fact from `events`
  * directly. Plus the seven per-type DAX measures (Q5–Q11,
  * `DAX Measures Used.txt:26-65`) as individually named queries, closing
  * the reference's 12-measure contract literally.
  *
  * Everything in the synthesized CSV is integer-derived (no double→string
  * formatting, which differs between engines) and pinned to January 2025 so
  * the Bucharest conversion is a constant +02:00 (EET, no DST) — the oracle
  * mirrors it with pure integer arithmetic, no ICU/timezone functions.
  */
object PipelineQueries {

  /** The reference's seven filtered COUNTROWS activity types
    * (`DAX Measures Used.txt:26-65`), in measure order Q5–Q11.
    */
  val DaxTypes: Seq[String] = Seq("earthquake", "explosion", "ice quake",
    "landslide", "quarry blast", "sonic boom", "volcanic eruption")

  private def daxTypeExpr: Column =
    element_at(array(DaxTypes.map(lit): _*), (col("event_id") % 7 + 1).cast("int"))

  /** 22-column USGS-format CSV lines (`stg_full_load.py:53-58` order),
    * derived deterministically from (event_id, user_id, event_type). The
    * place field is double-quoted because the synthesized places contain
    * commas; every other field is unquoted and comma-free. Some rows are
    * built to fail DQ ('' / '0' normalization, depth NULL, magError > 0.5,
    * depthError > 30, mag < 1) so the reject channel is exercised too.
    */
  private def synthRawLines(ev: DataFrame): DataFrame = {
    // the time math below is pinned to January 2025 (fixed +02:00 offset,
    // no ICU in the oracle); past day 21 the synthesized date string would
    // be invalid ('2025-01-32') and BOTH engines would mis-parse — fail
    // loudly instead of silently breaking at larger scale factors
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
    require(maxId + 7200 < 22L * 86400,
      s"e2e fixture overflows January 2025: max event_id $maxId (supported < ${22L * 86400 - 7200})")
    val e = col("event_id")
    val u = coalesce(col("user_id"), lit(7L))
    val et = coalesce(col("event_type"), lit("unknown"))
    def p2(c: Column) = lpad(c.cast("string"), 2, "0")
    val t = e // seconds offset from 2025-01-10T00:00:00Z; unique per row
    val timeS = concat(lit("2025-01-"), p2((t / 86400).cast("long") + 10), lit("T"),
      p2(((t % 86400) / 3600).cast("long")), lit(":"),
      p2(((t % 3600) / 60).cast("long")), lit(":"), p2(t % 60), lit("Z"))
    val place = when(u % 5 === 0, concat(et, lit(" region")))
      .when(u % 5 === 1, concat(lit("10km SW of "), et, lit(", CA")))
      .when(u % 5 === 2, concat(lit("north of "), et, lit(", Japan")))
      .when(u % 5 === 3, concat(et, lit(", Alaska")))
      .otherwise(lit("")) // '' → NULL at staging
    val net = element_at(array(lit("us"), lit("ak"), lit("nc"), lit("uw")),
      (u % 4 + 1).cast("int"))
    val line = concat_ws(",",
      timeS,                                                   // time
      (u % 171 - 85).cast("string"),                           // latitude ('0' → NULL when u%171=85)
      (u % 351 - 175).cast("string"),                          // longitude
      (e % 700).cast("string"),                                // depth ('0' → NULL → DQ reject if earthquake)
      concat((e % 9).cast("string"), lit("."), (e % 10).cast("string")), // mag
      lit("md"),                                               // magType
      (e % 60).cast("string"),                                 // nst
      (e % 360).cast("string"),                                // gap
      concat((e % 5).cast("string"), lit("."), (u % 100).cast("string")), // dmin
      lit("1.2"),                                              // rms
      net,                                                     // net
      concat(lit("ev"), e.cast("string")),                     // id
      lit(""),                                                 // updated ('' → NULL)
      concat(lit("\""), place, lit("\"")),                     // place (quoted: contains commas)
      daxTypeExpr,                                             // type
      concat((e % 3).cast("string"), lit("."), (e % 4).cast("string")), // horizontalError
      when(e % 41 === 0, lit("40")).otherwise(lit("5")),       // depthError (>30 → reject)
      when(e % 29 === 0, lit("0.9")).otherwise(lit("0.2")),    // magError (>0.5 → reject)
      (e % 20).cast("string"),                                 // magNst
      when(u % 2 === 0, lit("reviewed")).otherwise(lit("automatic")), // status
      net,                                                     // locationSource
      net)                                                     // magSource
    ev.select(line.as("value"))
  }

  // the whole full-load chain, end to end, fact table out. Column set
  // excludes ID_Event (sha1-keyed — DuckDB 1.0 has no sha1; the key
  // formula is unit-tested against reference vectors in PropertiesSpec)
  // and the audit columns (wall-clock/jobid stamps).
  private val e2eQuery: Q = (s, dir) => {
      import s.implicits._
      val root = s"target/e2e/${new java.io.File(dir).getName}"
      wipe(s, root)
      val landing = s"$root/landing"
      synthRawLines(Tables(s, dir, "events"))
        .coalesce(1).write.mode("overwrite").text(landing)
      val states = Seq(("California", "CA"), ("Alaska", "AK"))
        .toDF("State", "Abbreviation")
      val wh = Warehouse(s"$root/wh")
      FullLoad.run(s, s"$landing/part-*", states, wh,
        "e2e_job", Timestamp.valueOf("2025-06-01 12:00:00"))
      factProjection(s.read.parquet(wh.fact))
  }

  /** The delta chain end to end (`load_controller_DAG.py:188`): full load
    * over the `e % 3 ≠ 0` events, then [[graft.pipeline.DeltaLoad]] over
    * the rest — staging truncate, key-deduped ODS/T_ODS appends,
    * max-id-continued dimension extension, fact MERGE. The full-load
    * archive stage has already moved the first landing file, so the glob
    * resolves to the delta file alone, exactly the per-run cadence the
    * reference's DAG drives. The oracle reproduces the two-phase dimension
    * numbering (phase-1 ids, then new values from max+1).
    */
  private val e2eDeltaQuery: Q = (s, dir) => {
    import s.implicits._
    val root = s"target/e2e_delta/${new java.io.File(dir).getName}"
    wipe(s, root)
    val landing = s"$root/landing"
    val ev = Tables(s, dir, "events")
    val states = Seq(("California", "CA"), ("Alaska", "AK"))
      .toDF("State", "Abbreviation")
    val wh = Warehouse(s"$root/wh")
    synthRawLines(ev.filter(col("event_id") % 3 =!= 0))
      .coalesce(1).write.mode("overwrite").text(landing)
    FullLoad.run(s, s"$landing/part-*", states, wh, "e2e_full",
      Timestamp.valueOf("2025-06-01 12:00:00"))
    synthRawLines(ev.filter(col("event_id") % 3 === 0))
      .coalesce(1).write.mode("overwrite").text(landing)
    DeltaLoad.run(s, s"$landing/part-*", states, wh, "e2e_delta",
      Timestamp.valueOf("2025-06-02 12:00:00"))
    factProjection(s.read.parquet(wh.fact))
  }

  /** The delta chain again, but the delta file is consumed by the
    * STREAMING path ([[graft.streaming.DeltaStream.startDeltaLoad]]): full
    * load in batch, then the landing directory becomes a file-source stream
    * whose one micro-batch runs the whole delta warehouse chain in
    * `foreachBatch`. The oracle is the SAME SQL as `e2e_delta_load` —
    * stream and batch must produce the identical fact table, which is the
    * exactly-once claim made mechanical.
    */
  private val e2eStreamDeltaQuery: Q = (s, dir) => {
    import s.implicits._
    val root = s"target/e2e_stream/${new java.io.File(dir).getName}"
    wipe(s, root)
    val landing = s"$root/landing"
    val ev = Tables(s, dir, "events")
    val states = Seq(("California", "CA"), ("Alaska", "AK"))
      .toDF("State", "Abbreviation")
    val wh = Warehouse(s"$root/wh")
    synthRawLines(ev.filter(col("event_id") % 3 =!= 0))
      .coalesce(1).write.mode("overwrite").text(landing)
    FullLoad.run(s, s"$landing/part-*", states, wh, "e2e_full",
      Timestamp.valueOf("2025-06-01 12:00:00"))
    // full load archived its file out of landing; the overwrite leaves the
    // delta file as the only stream input
    synthRawLines(ev.filter(col("event_id") % 3 === 0))
      .coalesce(1).write.mode("overwrite").text(landing)
    val q = graft.streaming.DeltaStream.startDeltaLoad(s, landing, states, wh,
      s"$root/ckpt", "e2e_stream",
      Some(Timestamp.valueOf("2025-06-02 12:00:00")))
    try { q.processAllAvailable() } finally q.stop()
    factProjection(s.read.parquet(wh.fact))
  }

  /** Wipe an e2e working root so every invocation runs the chain against an
    * empty warehouse. Without this, repeated invocations (bench warm-up +
    * reps, successive rounds with different code) leave archived landing
    * files, run-log entries, and prior-generation ODS part files behind —
    * for streaming, a stale checkpoint would even mark the landing file as
    * already processed and silently skip the delta. Measured: the stale
    * state more than doubled e2e_delta_load (24.8 s vs 11.8 s fresh) and
    * grew across rounds.
    */
  private def wipe(s: org.apache.spark.sql.SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def factProjection(fact: DataFrame): DataFrame =
    fact.select(
      col("ID_Network_ID"), col("ID_RegionCountry_ID"), col("ID_type_ID"),
      col("ID_date_ID"), col("ID_depthCategory_ID"), col("ID_magCategory_ID"),
      col("VL_n_mag"), col("VL_n_depth"), col("LB_place"), col("DT_time"),
      col("VL_latitude"), col("VL_longitude"), col("ID_nst"), col("ID_gap"),
      col("VL_dmin"), col("VL_horizontalError"), col("ID_magNst"))
      .orderBy("DT_time")

  /** Q12 — Total Seismic Events (`DAX Measures Used.txt:68`,
    * `COUNTROWS(V_FACT_Event)`): the unfiltered fact row count, closing the
    * 12-measure contract. Map-side partial count → one scalar; scale-free.
    */
  private val q12Query: Q = (s, dir) =>
    Measures.totalSeismicEvents(
      Tables(s, dir, "events").select(col("event_id").as("ID_Event")))

  val all: Map[String, Q] =
    daxQueries + ("dax_q12_total_seismic_events" -> q12Query) +
      ("e2e_full_load" -> e2eQuery) + ("e2e_delta_load" -> e2eDeltaQuery) +
      ("e2e_stream_delta" -> e2eStreamDeltaQuery)

  /** Q5–Q11 as individually named measures: a mini star (type dim from the
    * mapped activity type, facts joined broadcast) feeding
    * [[Measures.totalsByType]] filtered to the one type — the literal
    * per-measure surface of the reference dashboard.
    */
  private def daxQueries: Map[String, Q] =
    DaxTypes.zipWithIndex.map { case (t, i) =>
      val name = s"dax_q${"%02d".format(i + 5)}_total_${t.replace(' ', '_')}s"
      name -> ((s: org.apache.spark.sql.SparkSession, dir: String) => {
        val ev = Tables(s, dir, "events").withColumn("_lb", daxTypeExpr)
        val dim = DimBuilder.build(ev, Seq(col("_lb")), Seq("LB_type"), "ID_type_ID")
        val fact = ev
          .join(broadcast(dim), col("_lb") <=> col("LB_type"))
          .select(col("event_id").as("ID_Event"), col("ID_type_ID"))
        Measures.totalsByType(fact, dim).filter(col("LB_type") === t)
      })
    }.toMap

  // ── oracle SQL ──

  private val daxTypeSql =
    "['earthquake','explosion','ice quake','landslide','quarry blast'," +
      "'sonic boom','volcanic eruption'][CAST(event_id % 7 + 1 AS INT)]"

  private def daxOracle: Map[String, String] =
    DaxTypes.zipWithIndex.map { case (t, i) =>
      val name = s"dax_q${"%02d".format(i + 5)}_total_${t.replace(' ', '_')}s"
      name ->
        s"""SELECT '$t' AS LB_type, count(*) AS total_events
           |FROM events WHERE $daxTypeSql = '$t' GROUP BY 1""".stripMargin
    }.toMap

  /** Shared DuckDB mirror of the transform chain RAW → enriched ODS:
    * synthesize the same field values (post '' / '0' normalization, folded
    * in since the generators are known), apply the DQ gate, the ODS
    * casts/derivations and the place parser. `phase` tags each row with
    * its landing file (1 = full load: e % 3 ≠ 0 … everything for the
    * single-file chain, 2 = delta file) for the two-phase dim numbering.
    */
  private def chainCtes: String = {
    val states = "(VALUES ('California','CA'), ('Alaska','AK')) s(State, Abbreviation)"
    s"""WITH src AS (
       |  SELECT event_id AS e, coalesce(user_id, 7) AS u,
       |         coalesce(event_type, 'unknown') AS et
       |  FROM events),
       |synth AS (
       |  SELECT e, u, et,
       |    CASE WHEN e % 3 = 0 THEN 2 ELSE 1 END AS phase,
       |    CASE WHEN u % 171 = 85 THEN NULL ELSE u % 171 - 85 END AS lat_v,
       |    CASE WHEN u % 351 = 175 THEN NULL ELSE u % 351 - 175 END AS lon_v,
       |    CASE WHEN e % 700 = 0 THEN NULL ELSE e % 700 END AS depth_i,
       |    CAST(CAST(e % 9 AS VARCHAR) || '.' || CAST(e % 10 AS VARCHAR) AS DOUBLE) AS mag_v,
       |    CASE WHEN e % 29 = 0 THEN 0.9 ELSE 0.2 END AS magerr_v,
       |    CASE WHEN e % 41 = 0 THEN 40.0 ELSE 5.0 END AS deptherr_v,
       |    CASE WHEN e % 60 = 0 THEN NULL ELSE e % 60 END AS nst_v,
       |    CASE WHEN e % 360 = 0 THEN NULL ELSE e % 360 END AS gap_v,
       |    CASE WHEN e % 20 = 0 THEN NULL ELSE e % 20 END AS magnst_v,
       |    CAST(CAST(e % 5 AS VARCHAR) || '.' || CAST(u % 100 AS VARCHAR) AS DOUBLE) AS dmin_v,
       |    CAST(CAST(e % 3 AS VARCHAR) || '.' || CAST(e % 4 AS VARCHAR) AS DOUBLE) AS herr_v,
       |    ['us','ak','nc','uw'][CAST(u % 4 + 1 AS INT)] AS net_v,
       |    ['earthquake','explosion','ice quake','landslide','quarry blast','sonic boom','volcanic eruption'][CAST(e % 7 + 1 AS INT)] AS typ,
       |    CASE WHEN u % 5 = 0 THEN et || ' region'
       |         WHEN u % 5 = 1 THEN '10km SW of ' || et || ', CA'
       |         WHEN u % 5 = 2 THEN 'north of ' || et || ', Japan'
       |         WHEN u % 5 = 3 THEN et || ', Alaska'
       |         ELSE NULL END AS place_v
       |  FROM src),
       |acc AS (
       |  SELECT * FROM synth
       |  WHERE NOT (typ = 'earthquake' AND
       |    (coalesce(CAST(depth_i AS DOUBLE), 0) < 1 OR magerr_v > 0.5
       |     OR deptherr_v > 30 OR mag_v < 1))),
       |ods AS (
       |  SELECT *,
       |    mag_v + 0.5 * magerr_v AS vl_n_mag,
       |    CASE WHEN depth_i IS NULL THEN NULL
       |         ELSE CAST(depth_i AS DOUBLE) + 0.5 * deptherr_v END AS vl_n_depth,
       |    '2025-01-' || lpad(CAST(10 + (e + 7200) // 86400 AS VARCHAR), 2, '0') || ' ' ||
       |      lpad(CAST(((e + 7200) % 86400) // 3600 AS VARCHAR), 2, '0') || ':' ||
       |      lpad(CAST(((e + 7200) % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
       |      lpad(CAST((e + 7200) % 60 AS VARCHAR), 2, '0') AS dt_s,
       |    CAST(20250110 + (e + 7200) // 86400 AS INT) AS date_id
       |  FROM acc),
       |cat AS (
       |  SELECT *,
       |    CASE WHEN vl_n_mag < 3 THEN 'Not Felt' WHEN vl_n_mag < 4 THEN 'Minor'
       |         WHEN vl_n_mag < 5 THEN 'Light' WHEN vl_n_mag < 6 THEN 'Moderate'
       |         WHEN vl_n_mag < 7 THEN 'Strong' WHEN vl_n_mag < 8 THEN 'Major'
       |         ELSE 'Great' END AS magcat,
       |    coalesce(CASE WHEN vl_n_depth IS NULL THEN NULL
       |         WHEN vl_n_depth <= 70 THEN 'Shallow'
       |         WHEN vl_n_depth <= 300 THEN 'Intermediate'
       |         ELSE 'Deep' END, 'Shallow') AS depthcat
       |  FROM ods),
       |lk AS (SELECT trim(State) AS k, State AS v FROM $states
       |       UNION ALL SELECT trim(Abbreviation), State FROM $states),
       |pj AS (
       |  SELECT c.*, lk.v AS state_name,
       |    trim(regexp_extract(place_v, '^(.*),[^,]*$$', 1)) AS left_part
       |  FROM cat c LEFT JOIN lk
       |    ON (CASE WHEN contains(place_v, ',')
       |             THEN trim(regexp_extract(place_v, ',([^,]*)$$', 1)) END) = lk.k),
       |enr AS (
       |  SELECT *,
       |    CASE WHEN place_v IS NULL OR place_v = '' THEN NULL
       |         WHEN NOT contains(place_v, ',') THEN trim(place_v)
       |         WHEN state_name IS NOT NULL THEN state_name
       |         WHEN regexp_extract(left_part, '(?i)of\\s+(.+)$$', 1) <> ''
       |           THEN trim(regexp_extract(left_part, '(?i)of\\s+(.+)$$', 1))
       |         ELSE left_part END AS region,
       |    CASE WHEN place_v IS NULL OR place_v = '' OR NOT contains(place_v, ',') THEN NULL
       |         WHEN state_name IS NOT NULL THEN 'USA'
       |         ELSE trim(regexp_extract(place_v, ',([^,]*)$$', 1)) END AS country
       |  FROM pj)""".stripMargin
  }

  /** The five value dimensions as (select-list, output columns, CTE name). */
  private val DimSpecs = Seq(
    ("dim_net", "net_v AS v", Seq("v"), "x.net_v IS NOT DISTINCT FROM dn.v", "dn"),
    ("dim_rc", "region AS r, country AS c", Seq("r", "c"),
      "x.region IS NOT DISTINCT FROM drc.r AND x.country IS NOT DISTINCT FROM drc.c", "drc"),
    ("dim_type", "typ AS v", Seq("v"), "x.typ IS NOT DISTINCT FROM dty.v", "dty"),
    ("dim_mag", "magcat AS v", Seq("v"), "x.magcat IS NOT DISTINCT FROM dm.v", "dm"),
    ("dim_depth", "depthcat AS v", Seq("v"), "x.depthcat IS NOT DISTINCT FROM dd.v", "dd"))

  /** Truncate-reload numbering: distinct values over the whole corpus. */
  private def singlePhaseDims: String = DimSpecs.map { case (nm, sel, cols, _, _) =>
    val order = cols.map(c => s"$c NULLS FIRST").mkString(", ")
    s"""$nm AS (SELECT row_number() OVER (ORDER BY $order) AS id, ${cols.mkString(", ")}
       |  FROM (SELECT DISTINCT $sel FROM enr))""".stripMargin
  }.mkString(",\n")

  /** Delta numbering (`DimBuilder.extend` semantics): phase-1 values get
    * full-load ids; values NEW in phase 2 continue from max(id) + 1 in
    * their own sort order, null-safe against re-inserting NULL rows.
    */
  private def twoPhaseDims: String = DimSpecs.map { case (nm, sel, cols, _, _) =>
    val order = cols.map(c => s"$c NULLS FIRST").mkString(", ")
    val colList = cols.mkString(", ")
    val notExists = cols.map(c => s"d.$c IS NOT DISTINCT FROM x.$c").mkString(" AND ")
    s"""${nm}1 AS (SELECT row_number() OVER (ORDER BY $order) AS id, $colList
       |  FROM (SELECT DISTINCT $sel FROM enr WHERE phase = 1)),
       |${nm}2 AS (SELECT (SELECT coalesce(max(id), 0) FROM ${nm}1)
       |             + row_number() OVER (ORDER BY $order) AS id, $colList
       |  FROM (SELECT DISTINCT $sel FROM enr WHERE phase = 2) x
       |  WHERE NOT EXISTS (SELECT 1 FROM ${nm}1 d WHERE $notExists)),
       |$nm AS (SELECT * FROM ${nm}1 UNION ALL SELECT * FROM ${nm}2)""".stripMargin
  }.mkString(",\n")

  private def factSelect: String = {
    val joins = DimSpecs.map { case (nm, _, _, cond, alias) =>
      s"JOIN $nm $alias ON $cond"
    }.mkString("\n")
    s"""SELECT dn.id AS ID_Network_ID, drc.id AS ID_RegionCountry_ID,
       |  dty.id AS ID_type_ID, x.date_id AS ID_date_ID,
       |  dd.id AS ID_depthCategory_ID, dm.id AS ID_magCategory_ID,
       |  x.vl_n_mag AS VL_n_mag, x.vl_n_depth AS VL_n_depth,
       |  x.place_v AS LB_place, CAST(x.dt_s AS TIMESTAMP) AS DT_time,
       |  CAST(x.lat_v AS DOUBLE) AS VL_latitude, CAST(x.lon_v AS DOUBLE) AS VL_longitude,
       |  CAST(x.nst_v AS INT) AS ID_nst, CAST(x.gap_v AS INT) AS ID_gap,
       |  x.dmin_v AS VL_dmin, x.herr_v AS VL_horizontalError,
       |  CAST(x.magnst_v AS INT) AS ID_magNst
       |FROM enr x
       |$joins
       |ORDER BY DT_time""".stripMargin
  }

  private def e2eSql: String =
    s"$chainCtes,\n$singlePhaseDims\n$factSelect"

  private def e2eDeltaSql: String =
    s"$chainCtes,\n$twoPhaseDims\n$factSelect"

  val oracle: Map[String, String] =
    daxOracle +
      ("dax_q12_total_seismic_events" ->
        "SELECT count(*) AS total_seismic_events FROM events") +
      ("e2e_full_load" -> e2eSql) + ("e2e_delta_load" -> e2eDeltaSql) +
      // stream and batch delta must agree exactly — same oracle
      ("e2e_stream_delta" -> e2eDeltaSql)
}
