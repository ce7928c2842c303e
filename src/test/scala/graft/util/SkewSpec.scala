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

  test("salted: a hot key's reducer input is split into ~salt balanced sub-keys") {
    // 8000 rows of one hot key vs 100 of a cold one: the plain join shuffles
    // all 8000 to ONE reducer (max per-key group = 8000); salting must cut
    // the largest (key, _salt) group to ~1/salt of that
    val salt = 8
    val hot = spark.range(8000).select(col("id"), lit("hot").as("k"))
    val cold = spark.range(100).select((col("id") + 10000).as("id"), lit("cold").as("k"))
    val skewed = hot.unionByName(cold)

    val plainMax = skewed.groupBy("k").count()
      .agg(max("count")).as[Long].head()
    val saltedMax = Skew.salted(skewed, salt).groupBy("k", "_salt").count()
      .agg(max("count")).as[Long].head()
    val saltedGroups = Skew.salted(skewed, salt)
      .filter($"k" === "hot").select("_salt").distinct().count()

    assert(plainMax === 8000L)
    assert(saltedGroups === salt.toLong, "every sub-key populated")
    // xxhash64 row salts are ~uniform; 1.5x slack over the ideal 1000
    assert(saltedMax <= 8000L / salt * 3 / 2,
      s"hot key not split: max salted group $saltedMax")
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
