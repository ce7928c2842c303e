package graft

import graft.ext.Similarity
import graft.util.Tables

/** Offline recall probe for the JL + IVF production composition
  * ([[graft.ext.Similarity.jlIvfTopK]]) — the COMPOSED loss (JL
  * distortion, priced alone by x130, ∘ IVF cell truncation, priced alone
  * by x122) measured against the full-dim exact top-k baseline. Run on a
  * bounded slice, NOT part of the driver query contract: the ground
  * truth is the guarded all-pairs pass, a sampled tuning run by
  * contract. BASELINE.md records the numbers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.JlRouteProbe
  */
object JlRouteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables(spark, sfDir, "embeddings")
    val (k, inDims, nCells) = (5, 64, 16)
    for (outDims <- Seq(16, 32); nprobe <- Seq(1, 4)) {
      val rep = Similarity.topKRecallReport(e, "vec_id", "embedding", k,
        Similarity.jlIvfTopK(e, "vec_id", "embedding", k,
          outDims, inDims, nCells, nprobe))
        .agg(org.apache.spark.sql.functions.sum("n_exact"),
          org.apache.spark.sql.functions.sum("n_found")).head()
      val (nx, nf) = (rep.getLong(0), rep.getLong(1))
      println(f"[jlroute] dir=$sfDir outDims=$outDims%2d nprobe=$nprobe " +
        f"n_exact=$nx n_found=$nf recall=${nf.toDouble / nx}%.3f")
    }
    spark.stop()
  }
}
