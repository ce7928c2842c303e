package graft

import graft.ext.Dedup
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Mechanism probe for the banded-MinHash self-join at scale: counts
  * candidate pairs out of the band buckets (the quantity that bounds the
  * verify cost) and times the full near-dup pipeline, under a chosen
  * banding — the function-default k=8/r=2/5-char shingles, or the
  * lshPlan-chosen k=16/r=4/7-char banding the registered x3 runs.
  * BASELINE.md's round-10 100x section records the numbers and the
  * attribution (banding false-positive mass on a tiny-shingle-universe
  * corpus, not the plan, drives the super-linear growth).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_X3_K=16 ...] runMain
  * graft.X3Probe
  */
object X3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_X3_K", "8").toInt
    val bands = sys.env.getOrElse("SPARK_GRAFT_X3_BANDS", "4").toInt
    val shingleLen = sys.env.getOrElse("SPARK_GRAFT_X3_SHINGLE", "5").toInt
    val spark = graft.util.GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", k, shingleLen)
    val cands = Dedup.lshCandidates(
      Dedup.lshBuckets(sig, "doc_id", k, bands), "doc_id").persist()
    val nPairs = cands.count()
    val nDocs = cands.select(explode(array(col("doc_a"), col("doc_b")))
      .as("doc_id")).distinct().count()
    cands.unpersist()
    val t0 = System.nanoTime()
    val nDups = Dedup.minhashNearDups(docs, "text", "doc_id",
      k, bands, shingleLen).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[x3probe] dir=$sfDir k=$k bands=$bands shingle=$shingleLen " +
      f"candidate_pairs=$nPairs verify_docs=$nDocs dups=$nDups " +
      f"pipeline_s=$sec%.2f")
    spark.stop()
  }
}
