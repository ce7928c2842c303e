package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted skew join: exact equivalence with the plain join, for every join
  * type and with NULL keys.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = {
    // hot key "a" (90% of rows), plus a NULL-keyed row
    val skewed = ((1 to 90).map(i => (i.toLong, "a")) ++
      Seq((91L, "b"), (92L, "c"), (93L, null.asInstanceOf[String])))
      .toDF("id", "k")
    val dim = Seq(("a", 100L), ("b", 200L), ("d", 400L)).toDF("k", "v")
    (skewed, dim)
  }

  test("saltedJoin: result multiset identical to the plain join (inner and left_outer)") {
    val (skewed, dim) = fixture
    for (jt <- Seq("inner", "left_outer")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salt = 7, joinType = jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted === plain, jt)
    }
  }

  test("saltedJoin: salt=1 degenerates to the plain join; deterministic across runs") {
    val (skewed, dim) = fixture
    val r1 = Skew.saltedJoin(skewed, dim, Seq("k"), salt = 1)
      .collect().map(_.toSeq).toSet
    val r2 = Skew.saltedJoin(skewed, dim, Seq("k"), salt = 8)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
  }
}
