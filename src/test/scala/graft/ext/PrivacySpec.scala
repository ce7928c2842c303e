package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** k-anonymity report + suppression: class sizes, the k threshold boundary,
  * null-QI classes, and the suppressed release being k-anonymous.
  */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  // classes: (en,a)×4, (en,b)×2, (de,a)×1, (null,a)×2
  private def rows = Seq(
    (1L, Some("en"), "a"), (2L, Some("en"), "a"), (3L, Some("en"), "a"),
    (4L, Some("en"), "a"), (5L, Some("en"), "b"), (6L, Some("en"), "b"),
    (7L, Some("de"), "a"), (8L, None, "a"), (9L, None, "a")
  ).toDF("id", "lang", "src")

  test("report: class sizes and at_risk at the k boundary") {
    val got = Privacy.kAnonymityReport(rows, Seq("lang", "src"), k = 2)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("src"),
        r.getAs[Long]("class_size"), r.getAs[Boolean]("at_risk"))).toSet
    assert(got === Set(
      ("en", "a", 4L, false), ("en", "b", 2L, false),
      ("de", "a", 1L, true), (null, "a", 2L, false)))
  }

  test("suppress: at-risk rows lose their QIs, others keep them") {
    val got = Privacy.kAnonymitySuppress(rows, Seq("lang", "src"), k = 3)
      .orderBy("id").collect()
    // only (en,a)×4 reaches k=3; all other classes suppress
    val kept = got.filter(!_.getAs[Boolean]("suppressed"))
    assert(kept.map(_.getAs[Long]("id")).toSet === Set(1L, 2L, 3L, 4L))
    assert(kept.forall(r => r.getAs[String]("lang") == "en" &&
      r.getAs[String]("src") == "a" && r.getAs[Long]("class_size") == 4L))
    val supp = got.filter(_.getAs[Boolean]("suppressed"))
    assert(supp.length === 5)
    assert(supp.forall(r => r.getAs[String]("lang") == null &&
      r.getAs[String]("src") == null))
    // class sizes survive suppression (verdict-not-filter: audits see why)
    assert(supp.map(r => (r.getAs[Long]("id"), r.getAs[Long]("class_size")))
      .toSet === Set((5L, 2L), (6L, 2L), (7L, 1L), (8L, 2L), (9L, 2L)))
  }

  test("null QI values form their own audited class and rejoin null-safely") {
    val got = Privacy.kAnonymitySuppress(rows, Seq("lang", "src"), k = 2)
      .filter(col("id") >= 8).collect()
    // the (null, a) class has 2 members — not suppressed at k=2, which
    // requires the null-safe join to carry its count back
    assert(got.forall(r => !r.getAs[Boolean]("suppressed") &&
      r.getAs[Long]("class_size") == 2L && r.getAs[String]("src") == "a"))
  }

  test("lDiversity: homogeneous classes flagged regardless of size; " +
    "null sensitive values don't count toward diversity") {
    val d = Seq(
      // class (a): 4 rows but ALL lang=en → at risk at l=2
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"), (4L, "en", "a"),
      // class (b): 2 rows, 2 langs → diverse
      (5L, "en", "b"), (6L, "de", "b"),
      // class (c): 3 rows, langs {en, null} → only 1 counted → at risk
      (7L, "en", "c"), (8L, null, "c"), (9L, null, "c")
    ).toDF("id", "lang", "src")
    val got = Privacy.lDiversityReport(d, Seq("src"), "lang", l = 2)
      .collect().map(r => r.getAs[String]("src") ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("n_sensitive"),
          r.getAs[Boolean]("at_risk"))).toMap
    assert(got === Map(
      "a" -> (4L, 1L, true), "b" -> (2L, 2L, false), "c" -> (3L, 1L, true)))
  }

  test("lDiversity rejects a sensitive column that is also a QI") {
    intercept[IllegalArgumentException] {
      Privacy.lDiversityReport(rows, Seq("lang", "src"), "lang", l = 2)
    }
  }

  test("every surviving QI combination is k-anonymous") {
    val released = Privacy.kAnonymitySuppress(rows, Seq("lang", "src"), k = 2)
    val classSizes = released.filter(!col("suppressed"))
      .groupBy("lang", "src").count()
      .select(col("count")).as[Long].collect()
    assert(classSizes.nonEmpty && classSizes.forall(_ >= 2L))
  }

  test("tCloseness: hand-computed TV distances; boundary is strict; " +
    "null-sensitive rows excluded; all-null class reports null verdict") {
    // class A: {x:2, y:2} m=4; class B: {x:4} m=4; global {x:6, y:2} N=8
    // TV(A) = ½(|½−¾| + |½−¼|) = 0.25 = TV(B) = ½(¼ + ¼)
    val d = Seq(
      (1L, "x", "A"), (2L, "x", "A"), (3L, "y", "A"), (4L, "y", "A"),
      (5L, "x", "B"), (6L, "x", "B"), (7L, "x", "B"), (8L, "x", "B"),
      (9L, null, "C"), (10L, null, "C")
    ).toDF("id", "sens", "cls")
    def report(tNum: Long, tDen: Long) =
      Privacy.tClosenessReport(d, Seq("cls"), "sens", tNum, tDen)
        .collect().map(r => r.getAs[String]("cls") ->
          (r.getAs[Long]("class_size"), Option(r.getAs[java.lang.Long]("tv_num")),
            Option(r.getAs[java.lang.Double]("tv_distance")),
            Option(r.getAs[java.lang.Boolean]("at_risk")))).toMap
    // tv_num = Σ|c·N − g·m| + m·(N − Σg_present): A: 8+8+0; B: 8+4·2
    val at14 = report(1, 4)
    assert(at14("A") === ((4L, Some(16L), Some(0.25), Some(false))))
    assert(at14("B") === ((4L, Some(16L), Some(0.25), Some(false))))
    // distance exactly t is COMPLIANT (strict >); at t=1/5 both fail
    val at15 = report(1, 5)
    assert(at15("A")._4 === Some(true) && at15("B")._4 === Some(true))
    // the all-null class is audited (class_size) but has no distribution
    assert(at14("C") === ((2L, None, None, None)))
  }
}
