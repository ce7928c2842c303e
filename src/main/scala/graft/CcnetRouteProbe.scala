package graft

import graft.ext.Corpus
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Growth probe for the frozen-threshold CCNet routing leg (x146's
  * production contract): the reference state (LM count table + tercile
  * thresholds) is built UNTIMED over each scale's corpus, then a FIXED
  * arrival slice (the base corpus's `doc_id % 7 = 0` docs — ScaleData's
  * offset copies never reuse base ids, so it is the same batch at every
  * scale) is routed against it, timed. Separates "per-batch work ∝
  * batch" from the state-size term: ScaleData's per-copy cipher makes
  * vocabulary grow LINEARLY with copies (real corpora follow Heaps' law
  * — sub-linear), so the broadcast count table here grows ~100× at sf10
  * and the probe reads out exactly how much of the routing cost is that
  * broadcast, honestly worst-case. Not part of the driver contract.
  *
  * Usage: runMain graft.CcnetRouteProbe [sfDir] [reps]
  */
object CcnetRouteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val baseMax = Tables(spark, "/root/testdata/sf0.1", "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    val batch = d.filter(col("doc_id") % 7 === 0 &&
      col("doc_id") <= baseMax)

    // frozen state, built untimed and persisted (the maintained tables)
    val counts = Corpus.lmCountTable(
      graft.util.Par.spread(corpus.filter(col("lang") === "en")), "text")
      .persist()
    val nCounts = counts.count()
    val thr = Corpus.ccnetThresholdsFromCounts(corpus, counts,
      "text", "doc_id", "lang").persist()
    thr.count()
    println(s"[ccnet-route] state: count-table rows=$nCounts")

    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Corpus.ccnetRoute(batch, counts, thr, "text", "doc_id", "lang")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[ccnet-route] route fixed batch: median=${ts.sorted.apply((reps - 1) / 2)}%6.2f s reps=" +
      ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    spark.stop()
  }
}
