package graft

import graft.ext.Corpus
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Growth probe for the maintained-probe heavy-hitter form (x135b):
  * times the SKETCH pass (linear corpus scan, exchange capped at
  * depth×width) and the PER-BATCH PROBE (a FIXED arrival slice's distinct
  * grams estimated against the sketch) separately at each scale, so the
  * claim "per-batch work is ∝ batch, near-flat in corpus size" is a
  * measured number beside the batch fallback's gram-universe `distinct()`
  * (59.4 s at the 100× corpus, BASELINE round-10). The batch is pinned to
  * the BASE corpus's id range (`doc_id % 10 = 7 AND doc_id ≤ max(base)`),
  * which ScaleData's offset copies never reuse — the same documents at
  * every scale, so only the corpus side grows. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.X135bProbe [sfDir] [reps]
  */
object X135bProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, dir, "documents")
    // fixed batch: the base corpus's arrival slice, identical at every sf
    val baseMax = Tables(spark, "/root/testdata/sf0.1", "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    val batch = docs.filter(col("doc_id") % 10 === 7 &&
      col("doc_id") <= baseMax)

    def time(label: String)(job: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); job; (System.nanoTime() - t0) / 1e9
      }
      println(f"[x135b] $label%-18s median=${ts.sorted.apply((reps - 1) / 2)}%7.2f s reps=" +
        ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }

    // sketch pass timed unpersisted (each rep recomputes the corpus scan)
    time("sketch pass") {
      Corpus.cmsSketch(docs, "text", n = 3, depth = 4, width = 131072)
        .write.format("noop").mode("overwrite").save()
    }
    // the maintained state the monitor holds: built once, probed per batch
    val sketch = Corpus.cmsSketch(docs, "text", n = 3, depth = 4,
      width = 131072).persist()
    sketch.count() // untimed materialization
    time("batch probe") {
      Corpus.cmsHeavyHitterProbe(sketch, batch, "text", n = 3, depth = 4,
          width = 131072, phiNum = 1, phiDen = 16384)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
