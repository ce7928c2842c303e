package graft

import graft.util.{Scan, Tables}
import org.apache.spark.sql.functions._

/** Prices the PRUNED DELETE family (x171/x172) across scale — the
  * round-15 verdict's remaining ask: the two-job rewrite was only
  * measured at sf0.1. Run at 1×/10×/100× (sf0.1 → target/sf1 →
  * target/sf10, shards 32 → 64 → 128, the StringPrunedProbe treatment)
  * this reports, per scale:
  *
  *  - `deleteByKeys` (takedown of the lexicographically-median
  *    language): candidate shards (should track the PREDICATE, not the
  *    corpus — flat across scale), shards actually rewritten, rows
  *    removed, wall;
  *  - the SAME key re-deleted: zero candidates (the bloom rebuild
  *    removed its bits) — the replay/no-op wall, which is the retention
  *    loop's steady-state cost;
  *  - `deleteByRange` (expiry of the n_chars ≤ 30% band): same
  *    numbers off the stats envelopes, then the re-delete no-op
  *    (envelopes tightened past the expired range);
  *  - recovery head cost on an idle table (the FS probe every read and
  *    mutation pays) — constant in table size by construction,
  *    measured to keep it honest.
  *
  * Expectation at 100 TB: candidates flat, rewrite work ∝ touched
  * shards (not corpus), no-op re-delete near-free, recovery probe
  * constant. BASELINE.md records the table.
  *
  * Usage: runMain graft.DeleteScaleProbe [sfDir] [shards]
  */
object DeleteScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    def buildTable(suffix: String): (String, String, Long) = {
      val table = s"target/delete_scale_probe/documents_z$suffix"
      val d = Tables(spark, dir, "documents")
      val laid = graft.ext.Corpus.zorderLayoutN(d, "doc_id",
        Seq("lang", "n_chars"), bits = 8, nShards = shards,
        keepCols = Seq("lang", "source", "n_chars"))
        .drop("cell_lang", "cell_n_chars")
      val dict = graft.ext.Corpus.stringDimDict(d, "lang")
      Scan.writeSharded(spark, laid, table,
        statCols = Seq("lang", "n_chars"), sortCol = Some("zvalue"),
        bloomKeyCol = Some("lang"), bloomM = 1024,
        zTotalBits = Some(16), nShards = Some(shards),
        dicts = Map("lang" -> dict))
      val v = dict.join(dict.agg((max(col("rank")) / 2).cast("long")
        .as("rank")), Seq("rank")).head().getAs[String]("value")
      val total = spark.read.parquet(table).count()
      (table, v, total)
    }

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- takedown: deleteByKeys on the median language ----
    val (tk, v, total) = buildTable("_keys")
    val ((c1, t1, r1), w1) = timed(Scan.deleteByKeys(spark, tk, Seq(v)))
    println(f"[delete-probe] keys-delete    lang='$v' rows=$total%10d " +
      f"cands=${c1.size}%3d/$shards touched=${t1.size}%3d " +
      f"removed=$r1%9d wall=$w1%7.3f s")
    val ((c2, t2, r2), w2) = timed(Scan.deleteByKeys(spark, tk, Seq(v)))
    println(f"[delete-probe] keys-redelete  lang='$v' " +
      f"cands=${c2.size}%3d touched=${t2.size}%3d removed=$r2%9d " +
      f"wall=$w2%7.3f s (no-op: deleted key stopped routing)")

    // ---- retention: deleteByRange on the n_chars <= 30%% band ----
    val (tr, _, _) = buildTable("_range")
    val nb = Tables(spark, dir, "documents")
      .agg(min("n_chars"), max("n_chars")).head()
    val cutoff =
      nb.getLong(0) + (nb.getLong(1) - nb.getLong(0)) * 30 / 100
    val ranges: Seq[(String, Any, Any)] =
      Seq(("n_chars", nb.getLong(0), cutoff))
    val ((c3, t3, r3), w3) = timed(Scan.deleteByRange(spark, tr, ranges))
    println(f"[delete-probe] range-delete   cutoff=$cutoff%8d " +
      f"cands=${c3.size}%3d/$shards touched=${t3.size}%3d " +
      f"removed=$r3%9d wall=$w3%7.3f s")
    val ((c4, t4, r4), w4) = timed(Scan.deleteByRange(spark, tr, ranges))
    println(f"[delete-probe] range-redelete cands=${c4.size}%3d " +
      f"touched=${t4.size}%3d removed=$r4%9d wall=$w4%7.3f s " +
      "(no-op: envelopes tightened past the range)")

    // ---- recovery head cost on an idle table (constant by design) ----
    val (_, w5) = timed {
      (1 to 100).foreach(_ => Scan.recoverPendingDelete(spark, tr))
    }
    println(f"[delete-probe] recovery-probe idle x100 wall=$w5%7.3f s " +
      f"(${w5 * 10}%6.3f ms each)")
    spark.stop()
  }
}
