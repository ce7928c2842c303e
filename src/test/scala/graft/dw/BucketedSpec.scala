package graft.dw

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed storage: the co-located join path must be shuffle-free on the
  * big side, and the bucketed MERGE must preserve upsert semantics.
  */
class BucketedSpec extends SparkSpec {

  import spark.implicits._

  /** Force the sort-merge path (the at-scale scenario — broadcast would
    * hide whether bucketing removes the shuffle), restoring conf after.
    */
  private def withoutBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join plan has no exchange on either bucketed side") {
    Bucketed.writeBucketed((1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v"),
      "bk_a", "id", 8)
    Bucketed.writeBucketed((500L to 1500L).map(i => (i, s"w$i")).toDF("id", "w"),
      "bk_b", "id", 8)
    withoutBroadcast {
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join:\n$plan")
      assert(joined.count() === 501)
    }
  }

  test("recoverBucketed: kill between DROP and RENAME restores the merged table") {
    Bucketed.writeBucketed(Seq((1L, "a")).toDF("id", "v"), "bk_crash__next", "id", 2)
    spark.sql("DROP TABLE IF EXISTS bk_crash") // simulate post-DROP crash state
    Bucketed.mergeIntoBucketed(spark, "bk_crash",
      Seq((2L, "b")).toDF("id", "v"), "id", 2)
    assert(spark.table("bk_crash").as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "b"))
  }

  test("mergeIntoBucketed: upsert semantics, bucketing preserved across merges") {
    Bucketed.writeBucketed(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      "bk_fact", "id", 4)
    Bucketed.mergeIntoBucketed(spark, "bk_fact",
      Seq((2L, "B"), (3L, "c")).toDF("id", "v"), "id", 4)
    val got = spark.table("bk_fact").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))

    // still bucketed: a self-join after the merge needs no exchange
    withoutBroadcast {
      val again = spark.table("bk_fact").join(
        spark.table("bk_fact").withColumnRenamed("v", "v2"), "id")
      assert(!again.queryExecution.executedPlan.toString.contains("Exchange"))
    }

    // second merge keeps working (rename-swap left a clean state)
    Bucketed.mergeIntoBucketed(spark, "bk_fact",
      Seq((4L, "d")).toDF("id", "v"), "id", 4)
    assert(spark.table("bk_fact").count() === 4)
  }
}
