package graft

import graft.ext.Dedup
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Offline recall probe for the banded MinHash near-dup path
  * ([[graft.ext.Dedup.minhashRecallReport]]) — run on a sampled slice,
  * NOT part of the driver query contract: the exact ground truth is an
  * all-pairs Jaccard pass whose cost (dominated by pairwise set
  * intersections on this template-generated low-diversity testdata) is
  * out of line with the per-query bench suite. The report itself — and
  * the comparison against [[graft.ext.Dedup.lshPlan]]'s S-curve
  * prediction printed alongside — is the measured form of the banding's
  * recall claim; BASELINE.md records the numbers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_SAMPLE_MOD=3] runMain
  * graft.MinhashRecallProbe
  */
object MinhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_MOD", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val (k, bands, shingleLen) = (16, 4, 7)
    val docs = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % mod === 0)
    val rep = Dedup.minhashRecallReport(docs, "text", "doc_id",
      k, bands, shingleLen, thNum = 4, thDen = 5).orderBy("band").collect()
    println(s"[minhashrecall] dir=$sfDir sampleMod=$mod k=$k bands=$bands shingle=$shingleLen")
    rep.foreach { r =>
      val band = r.getAs[Int]("band")
      // the S-curve prediction at the band's midpoint Jaccard
      val jMid = math.min((band + 0.5) / 20.0, 1.0)
      val pred = Dedup.lshCollisionProb(jMid, k, bands)
      println(f"[minhashrecall] band=$band%2d J~$jMid%.3f n_exact=${r.getAs[Long]("n_exact")}%3d " +
        f"n_found=${r.getAs[Long]("n_found")}%3d recall=${r.getAs[Double]("recall")}%.3f " +
        f"predicted=${pred}%.3f")
    }
    spark.stop()
  }
}
