package graft

import graft.ext.Corpus
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Driver-side PLANNING-time probe for the x146 CCNet route (VERDICT r16
  * item 5): the query's explain text is ~6,800 lines because shared
  * subtrees print repeatedly, and while EXECUTION deduplicates them
  * (ReusedExchange / cached broadcast), Catalyst still ANALYZES and
  * OPTIMIZES the duplicated logical tree — this measures that cost
  * directly with a stopwatch around `queryExecution.executedPlan`
  * materialization (analysis → optimization → physical planning, the
  * work that happens before the first job submits), then executes the
  * same frame so the planning share of wall time is on record.
  * Not part of the driver contract.
  *
  * Usage: runMain graft.PlanTimeProbe [sfDir] [reps]
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { rep =>
      val d = Tables(spark, dir, "documents")
      val corpus = d.filter(col("doc_id") % 7 =!= 0)
      val counts = Corpus.lmCountTable(
        graft.util.Par.spread(corpus.filter(col("lang") === "en")),
        "text").persist()
      val thr = Corpus.ccnetThresholdsFromCounts(corpus, counts,
        "text", "doc_id", "lang")
      val routed = Corpus.ccnetRoute(d.filter(col("doc_id") % 7 === 0),
          counts, thr, "text", "doc_id", "lang")
        .orderBy("doc_id")
      val t0 = System.nanoTime()
      routed.queryExecution.executedPlan // forces analyze+optimize+plan
      val t1 = System.nanoTime()
      routed.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[x146-plan] rep $rep: catalyst_plan=${(t1 - t0) / 1e9}%.3f s " +
        f"execute=${(t2 - t1) / 1e9}%.3f s")
      counts.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
