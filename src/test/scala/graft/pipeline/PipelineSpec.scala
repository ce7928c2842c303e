package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import graft.SparkSpec
import graft.archive.Archive
import org.apache.spark.sql.functions._

/** Golden end-to-end pipeline test (SURVEY §5.4): full load on the USGS
  * fixture, then a delta on top, asserting layer contents, surrogate-key
  * continuation, MERGE idempotency, and archival.
  */
class PipelineSpec extends SparkSpec {

  import spark.implicits._

  private val ts = Timestamp.valueOf("2026-08-12 10:00:00")
  private val ts2 = Timestamp.valueOf("2026-08-13 10:00:00")

  private lazy val states = spark.read.option("header", "true")
    .csv(resource("us_states.csv"))

  private def setup(): (String, Warehouse) = {
    val root = Files.createTempDirectory("wh").toString
    val raw = s"$root/raw"
    Files.createDirectories(Paths.get(raw))
    Files.copy(Paths.get(resource("usgs_sample.csv")),
      Paths.get(raw, "whole_month_07.csv"), StandardCopyOption.REPLACE_EXISTING)
    (raw, Warehouse(s"$root/wh"))
  }

  test("Archive: partition extraction and load routing") {
    assert(Archive.datePartition("whole_month_07.csv") === "07")
    assert(Archive.datePartition("whole_month_202407.csv") === "202407")
    assert(Archive.datePartition("all_day_20260812-013000.csv") === "20260812")
    assert(Archive.datePartition("misc.csv") === "unpartitioned")
    assert(Archive.isFullLoad("whole_month_07.csv"))
    assert(!Archive.isFullLoad("all_day_20260812-013000.csv"))
  }

  test("Staging.run: observe counters match channel counts") {
    val (raw, wh) = setup()
    val m = graft.ingest.Staging.run(spark, s"$raw/*.csv", wh.stg,
      s"${wh.rejected}/t", "job-m", ts.toString)
    assert(m.counters("rows_written") === spark.read.parquet(wh.stg).count())
    assert(m.counters("rows_filtered") === m.split.rejected.count())
    assert(m.counters("rows_written") > 0 && m.counters("rows_filtered") > 0)
  }

  test("full load then delta: layers, keys, merge, archive") {
    val (raw, wh) = setup()

    // ── full load via the controller's filename routing ──
    Controller.run(spark, s"$raw/*.csv", states, wh, "job-full", ts)

    val stg = spark.read.parquet(wh.stg)
    val tOds = spark.read.parquet(wh.tOds)
    val fact = spark.read.parquet(wh.fact)
    val nFull = fact.count()
    assert(stg.count() === tOds.count())
    assert(nFull === stg.count())
    assert(stg.count() > 0)

    // DQ: fixture's reject-trigger rows must be absent from staging
    val ids = stg.select("id").as[String].collect().toSet
    assert(!ids.contains("ev_shallow") && !ids.contains("ev_magerr")
      && !ids.contains("ev_deptherr"))
    assert(ids.contains("ev_clean"))

    // place parse: US state resolved through the lookup
    val anch = tOds.filter($"LB_place".contains("Anchorage"))
    if (anch.count() > 0) {
      val r = anch.select("LB_Region", "LB_Country").head()
      assert(r.getString(0) === "Alaska" && r.getString(1) === "USA")
    }

    // star schema: every fact FK resolves (dims built from same ODS)
    assert(fact.filter($"ID_Network_ID".isNull).count() === 0)
    assert(fact.filter($"ID_date_ID".isNull).count() === 0)
    val netDim = spark.read.parquet(wh.dim("T_DIM_Network"))
    val maxNetId = netDim.agg(max("ID_Network_ID")).head().getLong(0)
    assert(netDim.count() === maxNetId) // dense 1..n

    // archive: raw file moved into the month partition
    assert(!Files.exists(Paths.get(raw, "whole_month_07.csv")))
    assert(Files.exists(Paths.get(s"${wh.archive}/07/whole_month_07.csv")))

    // ── delta: one replayed event (dedup/merge) + one new net/date ──
    val header = Files.readAllLines(Paths.get(resource("usgs_sample.csv"))).get(0)
    val replay = Files.readAllLines(Paths.get(resource("usgs_sample.csv"))).get(1)
    val novel = "2024-08-02T09:30:00.000Z,48.0,7.8,12.0,4.2,ml,30,60,0.2,0.1," +
      "zz,ev_new,2024-08-02T10:00:00.000Z,\"13 km E of Freiburg, Germany\"," +
      "earthquake,0.8,3.0,0.1,12,reviewed,zz,zz"
    Files.write(Paths.get(raw, "all_day_20240802-120000.csv"),
      java.util.Arrays.asList(header, replay, novel))

    Controller.run(spark, s"$raw/*.csv", states, wh, "job-delta", ts2)

    val fact2 = spark.read.parquet(wh.fact)
    assert(fact2.count() === nFull + 1) // replayed row merged, new row added

    // surrogate continuation: new network got max+1, existing kept their ids
    val netDim2 = spark.read.parquet(wh.dim("T_DIM_Network"))
    val zzId = netDim2.filter($"LB_NetworkSymbol" === "zz")
      .select("ID_Network_ID").head().getLong(0)
    assert(zzId === maxNetId + 1)
    // existing rows unchanged (set compare — SQL join would drop the
    // NULL-symbol row since NULL never equals NULL)
    val asSet = (df: org.apache.spark.sql.DataFrame) => df
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(asSet(netDim2.filter($"ID_Network_ID" <= maxNetId)) === asSet(netDim))

    // date dim: intrinsic yyyymmdd key appended for the new date
    val dates = spark.read.parquet(wh.dim("T_DIM_date"))
    assert(dates.filter($"ID_date_ID" === 20240802).count() === 1)

    // replaying the same delta file is a no-op (idempotency)
    Files.write(Paths.get(raw, "all_day_20240803-120000.csv"),
      java.util.Arrays.asList(header, replay, novel))
    Controller.run(spark, s"$raw/*.csv", states, wh, "job-delta2", ts2)
    assert(spark.read.parquet(wh.fact).count() === nFull + 1)
    assert(spark.read.parquet(wh.dim("T_DIM_Network")).count() === netDim2.count())
  }

  test("A5 run log: persisted per-stage counters equal the table deltas") {
    val (raw, wh) = setup()
    def metric(job: String, stage: String, m: String): Long =
      spark.read.parquet(wh.runLog)
        .filter($"job_execution_id" === job && $"stage" === stage
          && $"metric" === m)
        .select("value").head().getLong(0)

    Controller.run(spark, s"$raw/*.csv", states, wh, "job-full", ts)
    assert(metric("job-full", "staging", "rows_written")
      === spark.read.parquet(wh.stg).count())
    assert(metric("job-full", "staging", "rows_filtered") > 0)
    assert(metric("job-full", "full_load", "rows_tods_written")
      === spark.read.parquet(wh.tOds).count())
    assert(metric("job-full", "full_load", "rows_fact_written")
      === spark.read.parquet(wh.fact).count())

    // delta: one replayed + one novel event (same fixture as the e2e test)
    val lines = Files.readAllLines(Paths.get(resource("usgs_sample.csv")))
    val novel = "2024-08-02T09:30:00.000Z,48.0,7.8,12.0,4.2,ml,30,60,0.2,0.1," +
      "zz,ev_new,2024-08-02T10:00:00.000Z,\"13 km E of Freiburg, Germany\"," +
      "earthquake,0.8,3.0,0.1,12,reviewed,zz,zz"
    Files.write(Paths.get(raw, "all_day_20240802-120000.csv"),
      java.util.Arrays.asList(lines.get(0), lines.get(1), novel))
    val odsBefore = spark.read.parquet(wh.ods).count()
    val tOdsBefore = spark.read.parquet(wh.tOds).count()
    Controller.run(spark, s"$raw/*.csv", states, wh, "job-delta", ts2)
    assert(metric("job-delta", "staging", "rows_written")
      === spark.read.parquet(wh.stg).count())
    assert(metric("job-delta", "delta_load", "rows_ods_appended")
      === spark.read.parquet(wh.ods).count() - odsBefore)
    assert(metric("job-delta", "delta_load", "rows_tods_appended")
      === spark.read.parquet(wh.tOds).count() - tOdsBefore)
    assert(metric("job-delta", "delta_load", "rows_tods_appended") === 1L)
  }
}
