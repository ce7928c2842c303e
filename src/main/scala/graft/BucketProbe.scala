package graft

import graft.ext.Dedup
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Diagnostic for the banded-MinHash bucket distribution: the ten largest
  * (band, bucket) groups and how many ScaleData copies each spans
  * (`doc_id div 5000` on the derived sf dirs). Used to attribute the x3
  * 100× probe's candidate growth — cross-copy buckets indicate generator
  * bleed (fixed by the permAlphabet cipher), single-copy giants indicate
  * the corpus's tiny char-shingle universe collapsing a band
  * (BASELINE.md round-10 100× section).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BucketProbe
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = graft.util.GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 8, 5)
    Dedup.lshBuckets(sig, "doc_id", 8, 4)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"),
        countDistinct(expr("doc_id div 5000")).as("copies"))
      .orderBy(desc("n")).limit(10).collect()
      .foreach(r => println(
        s"[bucket] band=${r.get(0)} n=${r.get(2)} copies=${r.get(3)}"))
    spark.stop()
  }
}
