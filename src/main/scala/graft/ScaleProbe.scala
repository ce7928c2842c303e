package graft

import graft.ext.Similarity
import graft.util.Tables

/** Scale-probe companion to [[Bench]]: times library calls whose PARAMETERS
  * must scale with corpus size, which the fixed-parameter `queries()`
  * registrations (pinned for oracle comparability) cannot show.
  *
  * Motivating case: IVF compare cost is Σ cell² ≈ n²/nCells, so the
  * oracle-pinned `nCells = 16` is quadratic-ish under a 10× corpus — the
  * correct production setting is nCells ∝ √n, which holds per-query work at
  * n^1.5/√·. This main times `ivfQuantizedRescoreTopK` at the registered
  * nCells and at √-scaled nCells on the same corpus, so BASELINE.md can
  * report the parameter law with measured numbers instead of a claim.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_NCELLS=n,m,...] runMain
  * graft.ScaleProbe — prints one line per setting.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.local(cpus.toInt, cpus.toInt)
    val emb = Tables(spark, sfDir, "embeddings")
    val n = emb.count()
    val cells = sys.env.get("SPARK_GRAFT_NCELLS")
      .map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16, math.max(16, math.sqrt(n.toDouble).round.toInt)))
    cells.foreach { c =>
      val t0 = System.nanoTime()
      Similarity.ivfQuantizedRescoreTopK(emb, "vec_id", "embedding",
          k = 5, nCells = c, candK = 20)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"ivf_quantized_rescore n=$n nCells=$c took=$dt%.2f s")
    }
    // same parameter law for SemDeDup: pair cost is Σ cell², so the
    // oracle-pinned nCells=16 grows quadratic-ish with the corpus while
    // nCells ∝ √n holds it at n^1.5/√·
    cells.foreach { c =>
      val t0 = System.nanoTime()
      Similarity.semanticDedup(emb, "vec_id", "embedding",
          nCells = c, minCos = 0.45)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"semantic_dedup n=$n nCells=$c took=$dt%.2f s")
    }
    spark.stop()
  }
}
