package graft.ingest

import graft.SparkSpec
import graft.schemas.Schemas
import org.apache.spark.sql.functions._

class StagingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = Staging.readRawCsv(spark, resource("usgs_sample.csv"))
  private lazy val normalized = Staging.normalizeNulls(raw)
  private lazy val split = Staging.dqSplit(normalized)

  test("S1/P1: header skipped, all rows parsed, raw line kept") {
    assert(raw.count() === 10)
    assert(raw.columns.toSeq === Schemas.rawColumns :+ Staging.RawLineCol)
  }

  test("P1: short row padded with NULLs") {
    val short = raw.filter($"latitude" === "41.0").collect()
    assert(short.length === 1)
    assert(short.head.getAs[String]("mag") === "3.2")
    assert(short.head.getAs[String]("place") == null)
    assert(short.head.getAs[String]("magSource") == null)
  }

  test("P1: quoted place keeps its comma") {
    val r = raw.filter($"id" === "ev_clean").collect().head
    assert(r.getAs[String]("place") === "10km SSW of Idyllwild, CA")
  }

  test("P2: '' and '0' become NULL, other values trimmed") {
    val r = normalized.filter($"id" === "ev_zeros").collect().head
    assert(r.getAs[String]("nst") == null)  // literal '0' → NULL (lossy, by contract)
    assert(r.getAs[String]("gap") == null)  // empty → NULL
    assert(r.getAs[String]("mag") === "6.1")
  }

  test("P3: DQ split routes each reject trigger; type-gated; errors counted") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("id").as[String].collect().toSet
    val rejected = ids(split.rejected)
    assert(rejected === Set("ev_shallow", "ev_magerr", "ev_deptherr", "ev_lowmag"))
    val accepted = ids(split.accepted)
    assert(accepted.contains("ev_quarry")) // fails bounds but is not an earthquake
    assert(accepted.contains("ev_clean"))
    assert(ids(split.errors) === Set("ev_badnum")) // unparseable depth
  }

  test("K4: rejected channel carries the original csv line") {
    val lines = split.rejected.select(Staging.RawLineCol).as[String].collect()
    assert(lines.forall(_.contains(",earthquake,")))
    assert(lines.exists(_.contains("ev_lowmag")))
  }

  test("P4/P5: audit columns stamped, everything a string") {
    val stg = Staging.finalizeStg(split.accepted, "JOB-1", "whole_month_07.csv", "20240701-120000")
    assert(stg.columns.toSeq === (Schemas.rawColumns ++ Schemas.auditColumns))
    assert(stg.schema.fields.forall(_.dataType.typeName == "string"))
    val r = stg.filter($"id" === "ev_clean").collect().head
    assert(r.getAs[String]("insertion_date") === "20240701-120000")
    assert(r.getAs[String]("updated_date") == null)
    assert(r.getAs[String]("job_execution_id") === "JOB-1")
    assert(r.getAs[String]("data_source") === "whole_month_07.csv")
  }

  test("S2: latestFile resolves newest by mtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s2").toFile
    val f1 = new java.io.File(dir, "whole_month_01.csv")
    val f2 = new java.io.File(dir, "whole_month_02.csv")
    java.nio.file.Files.writeString(f1.toPath, "a\n")
    java.nio.file.Files.writeString(f2.toPath, "b\n")
    f1.setLastModified(1000000000000L)
    f2.setLastModified(2000000000000L)
    val got = Staging.latestFile(spark, s"${dir.getAbsolutePath}/whole_month_*.csv")
    assert(got.endsWith("whole_month_02.csv"))
  }
}
