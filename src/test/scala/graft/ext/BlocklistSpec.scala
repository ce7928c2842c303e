package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-routed blocklist anti-join: exactness (routing never changes the
  * result), the empty-list identity, and null-key semantics.
  */
class BlocklistSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = (1L to 200L).map(i => (i, s"doc $i")).toDF("id", "t")

  test("bloomAntiJoin equals the plain anti join, any fpp") {
    val blk = corpus.filter(col("id") % 7 === 0).select(col("id"))
    val expect = corpus.join(blk, Seq("id"), "left_anti")
      .as[(Long, String)].collect().sortBy(_._1)
    // a deliberately terrible fpp forces false positives through the
    // exact-confirm branch; the result must not change
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Blocklist.bloomAntiJoin(corpus, blk, "id", fpp = fpp)
        .as[(Long, String)].collect().sortBy(_._1)
      assert(got === expect, s"fpp=$fpp")
    }
  }

  test("empty blocklist is the identity (no NULL-blob wipeout)") {
    val blk = corpus.filter(col("id") < 0).select(col("id"))
    val got = Blocklist.bloomAntiJoin(corpus, blk, "id")
    assert(got.count() === 200L)
  }

  test("null corpus keys survive; null blocklist keys are ignored") {
    val c = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("id", "t")
    val blk = Seq(Some(2L), None).toDF("id")
    val got = Blocklist.bloomAntiJoin(c, blk, "id")
      .select(col("t")).as[String].collect().sorted
    // anti-join semantics: a NULL key never matches, so "b" stays; 2 goes
    assert(got === Array("a", "b"))
  }
}
