package graft

import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-runs the four ANN recall reports (x122 nprobe sweep, x125 Lloyd
  * refinement, x130 JL outDims sweep, x131 JL∘IVF composition) on the
  * CLUSTERED [[ClusteredData]] embeddings, where saturation is actually
  * demonstrable — the near-uniform driver testdata caps every recall
  * curve at 0.02–0.48 with no visible knee (BASELINE round-10 caveat).
  * Prints overall recall (Σ found / Σ exact over the top-5 ground truth)
  * per setting. Not part of the driver contract.
  *
  * Usage: runMain graft.ClusteredRecallProbe [n] [nClusters] [spread]
  */
object ClusteredRecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2048L)
    val nClusters = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spread = args.drop(2).headOption.map(_.toDouble).getOrElse(2.0)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val emb = ClusteredData.embeddings(spark, n, 64, nClusters, spread)
      .persist()
    emb.count()

    def overall(label: String, ann: DataFrame): Unit = {
      val r = Similarity.topKRecallReport(emb, "vec_id", "embedding",
          k = 5, ann, maxExactRows = 1000000L)
        .agg(sum(col("n_found")).as("f"), sum(col("n_exact")).as("e"))
        .head()
      val recall = r.getLong(0).toDouble / r.getLong(1)
      println(f"[clustered-recall] $label%-34s recall=$recall%.3f")
    }

    for (np <- Seq(1, 2, 4, 8))
      overall(s"x122 ivf nCells=$nClusters nprobe=$np",
        Similarity.ivfTopKProbed(emb, "vec_id", "embedding", k = 5,
          nCells = nClusters, nprobe = np))
    overall("x125 ivf seeded nprobe=1",
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        nCells = nClusters))
    overall("x125 ivf Lloyd-refined nprobe=1",
      Similarity.ivfTopKRefined(emb, "vec_id", "embedding", k = 5,
        nCells = nClusters))
    for (d <- Seq(4, 8, 16, 32))
      overall(s"x130 jl outDims=$d",
        Similarity.jlTopK(emb, "vec_id", "embedding", k = 5,
          outDims = d, inDims = 64, maxExactRows = 1000000L))
    for (np <- Seq(1, 2, 4))
      overall(s"x131 jl(16)+ivf nprobe=$np",
        Similarity.jlIvfTopK(emb, "vec_id", "embedding", k = 5,
          outDims = 16, inDims = 64, nCells = nClusters, nprobe = np))
    for (np <- Seq(1, 2, 4))
      overall(s"x143 jl(16)-route + rescore nprobe=$np",
        Similarity.jlIvfRescoreTopK(emb, "vec_id", "embedding", k = 5,
          outDims = 16, inDims = 64, nCells = nClusters, nprobe = np))
    for (od <- Seq(16, 32); it <- Seq(1, 3); np <- Seq(1, 2, 4, 8))
      overall(s"x147 jl($od) Lloyd($it)-route + rescore nprobe=$np",
        Similarity.jlIvfRescoreRefinedTopK(emb, "vec_id", "embedding",
          k = 5, outDims = od, inDims = 64, nCells = nClusters,
          nprobe = np, iters = it))
    spark.stop()
  }
}
