package graft.ods

import graft.SparkSpec
import graft.ingest.Staging
import org.apache.spark.sql.functions._

class OdsTransformSpec extends SparkSpec {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-07-01 15:00:00")

  private lazy val ods = {
    val raw = Staging.readRawCsv(spark, resource("usgs_sample.csv"))
    val split = Staging.dqSplit(Staging.normalizeNulls(raw))
    OdsTransform.toOds(
      Staging.finalizeStg(split.accepted, "JOB-1", "whole_month_07.csv", "20240701-120000"), ts)
  }

  test("P6: to_int truncates via double, bad input → NULL") {
    val df = Seq("12.7", "5", "abc", "", null).toDF("v")
      .select(OdsTransform.toInt($"v").as("i"), OdsTransform.toDouble($"v").as("d"))
    assert(df.select("i").as[Option[Int]].collect().toSeq ===
      Seq(Some(12), Some(5), None, None, None))
  }

  test("P7: derived measure falls back when error term NULL") {
    val df = Seq((Some(10.0), Some(2.0)), (Some(10.0), None), (None, Some(2.0)))
      .toDF("v", "e").select(OdsTransform.derived($"v", $"e").as("m"))
    assert(df.as[Option[Double]].collect().toSeq === Seq(Some(11.0), Some(10.0), None))
  }

  test("P8: bucket boundaries match the reference CASE chains") {
    val depth = Seq(69.9, 70.0, 70.1, 300.0, 300.1).toDF("d")
      .select(OdsTransform.depthCategory($"d")).as[String].collect().toSeq
    assert(depth === Seq("Shallow", "Shallow", "Intermediate", "Intermediate", "Deep"))
    val mag = Seq(2.9, 3.0, 3.9, 4.0, 5.0, 6.0, 7.0, 8.0).toDF("m")
      .select(OdsTransform.magCategory($"m")).as[String].collect().toSeq
    assert(mag === Seq("Not Felt", "Minor", "Minor", "Light", "Moderate", "Strong", "Major", "Great"))
    val nulls = Seq[Option[Double]](None).toDF("x")
      .select(OdsTransform.depthCategory($"x"), OdsTransform.magCategory($"x")).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("P9: DST-aware Europe/Bucharest conversion (summer +3h, winter +2h)") {
    val df = Seq("2024-07-01T12:00:00.000Z", "2024-01-15T12:00:00.000Z", "not a time")
      .toDF("t").select(OdsTransform.eestTime($"t").as("e"))
    assert(df.as[Option[String]].collect().toSeq ===
      Seq(Some("2024-07-01 15:00:00"), Some("2024-01-15 14:00:00"), None))
  }

  test("P10: stable 63-bit SHA-1 key matches reference vectors") {
    // vectors computed with the reference formula (ods_delta_load2.py:21-24)
    val df = Seq(("2024-03-15 10:30:00", "35.5", "-117.7"), ("x", "y", "z"))
      .toDF("t", "la", "lo")
      .select(OdsTransform.stableId($"t", $"la", $"lo").as("k"))
    assert(df.as[Long].collect().toSeq === Seq(8101205258239454766L, 6587985267447467476L))
    // NULL formats as "None" like the Python f-string
    val n = Seq((Option.empty[String], "y", "z"), (Some("None"), "y", "z"))
      .toDF("t", "la", "lo").select(OdsTransform.stableId($"t", $"la", $"lo").as("k"))
      .as[Long].collect()
    assert(n(0) === n(1))
  }

  test("ODS schema and representative row") {
    // compare name/type pairs (lit() columns are non-nullable, schema allows null)
    assert(ods.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      graft.schemas.Schemas.ods.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = ods.filter($"LB_place" === "10km SSW of Idyllwild, CA").collect().head
    assert(r.getAs[Double]("VL_n_mag") === 5.2 + 0.5 * 0.2)
    assert(r.getAs[String]("LB_magCategory") === "Moderate")
    assert(r.getAs[Double]("VL_n_depth") === 50.0 + 0.5 * 5.0)
    assert(r.getAs[String]("LB_depthCategory") === "Shallow")
    assert(r.getAs[String]("DT_time") === "2024-07-01 15:00:00")
    assert(r.getAs[Int]("ID_nst") === 20)
    assert(r.getAs[String]("_LB_data_source") === "whole_month_07.csv")
  }

  test("J3: delta dedup drops already-loaded keys via left-anti join") {
    val existing = Seq(1L, 2L).toDF("ID_Event")
    val fresh = Seq((1L, "dup"), (3L, "new")).toDF("ID_Event", "x")
    val got = OdsTransform.dedupeAgainstExisting(fresh, existing)
    assert(got.select("x").as[String].collect().toSeq === Seq("new"))
  }
}
