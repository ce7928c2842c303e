package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR-style importance affinity: the map-only scoring fold must equal an
  * independent explode+join derivation, target-like docs must outrank
  * raw-typical ones, and the scoring pass must plan shuffle-free.
  */
class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  // target slice (flag=1) speaks alpha/beta; the rest speaks zulu/yankee
  private def docs = Seq(
    (1L, "alpha beta alpha", 1), (2L, "beta alpha beta beta", 1),
    (3L, "alpha beta gamma", 1), (4L, "zulu yankee zulu", 0),
    (5L, "yankee zulu yankee yankee", 0), (6L, "alpha zulu", 0)
  ).toDF("id", "text", "flag")

  private val B = 64

  test("map-only fold equals the explode+join derivation") {
    val got = Corpus.importanceAffinity(docs, "text", "id",
      targetPred = col("flag") === 1, buckets = B)
    // independent path: explode tokens, bucket, join the tables row-wise
    val tTab = Corpus.hashedBucketTable(docs.filter(col("flag") === 1),
      "text", B).withColumnRenamed("n", "tn")
    val rTab = Corpus.hashedBucketTable(docs, "text", B)
      .withColumnRenamed("n", "rn")
    val bucket = conv(substring(md5(concat(lit("dsir|"), col("_tk"))), 1, 8),
      16, 10).cast("long") % B
    val expect = docs.select(col("id"),
        explode(TextAnalysis.tokens(col("text"))).as("_tk"))
      .select(col("id"), bucket.as("bucket"))
      .join(tTab, Seq("bucket"), "left").join(rTab, Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(coalesce(col("tn"), lit(0L)) + 1).as("tm"),
        sum(coalesce(col("rn"), lit(0L)) + 1).as("rm"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got.select(col("id"), col("target_mass"), col("raw_mass"))
      .as[(Long, Long, Long)].collect().foreach { case (id, tm, rm) =>
        assert((tm, rm) === expect(id), s"id=$id")
      }
  }

  test("target-like docs outrank raw-typical docs; mixed doc in between") {
    val aff = Corpus.importanceAffinity(docs, "text", "id",
      targetPred = col("flag") === 1, buckets = B)
      .select(col("id"), col("affinity")).as[(Long, Double)].collect().toMap
    val targetMin = Seq(1L, 2L, 3L).map(aff).min
    val rawMax = Seq(4L, 5L).map(aff).max
    assert(targetMin > rawMax)
    // the half-target doc sits strictly between the pure cohorts
    assert(aff(6L) > rawMax && aff(6L) < targetMin)
  }

  test("empty target table degrades to uniform target mass, no crash") {
    val got = Corpus.importanceAffinity(docs, "text", "id",
      targetPred = col("flag") === 99, buckets = B)
      .select(col("id"), col("n_toks"), col("target_mass"))
      .as[(Long, Long, Long)].collect()
    // all target counts are 0, so target_mass = n_toks (add-one only)
    assert(got.nonEmpty && got.forall { case (_, n, tm) => tm == n })
  }

  test("scoring pass against prebuilt tables plans without a shuffle") {
    val tTab = Corpus.hashedBucketTable(docs.filter(col("flag") === 1),
      "text", B)
    val rTab = Corpus.hashedBucketTable(docs, "text", B)
    val scored = Corpus.importanceAffinityAgainst(docs, "text", "id",
      tTab, rTab, B)
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"),
      "map-only scoring must not shuffle")
  }
}
