package graft

import graft.util.{Scan, Tables}
import graft.ext.Corpus
import org.apache.spark.sql.functions._

/** Prices the round-16 mutation family across scale — the three
  * capabilities that landed with only sf0.1 measurements: the sharded
  * MERGE (x175 `upsertSharded`), schema evolution (x174
  * `evolveAddColumn`), and prefix routing (x173 `readPrunedByPrefix`).
  * Run at 1×/10×/100× (sf0.1 → target/sf1 → target/sf10, shards
  * 32 → 64 → 128 — the StringPrunedProbe treatment), this reports:
  *
  *  - `upsertSharded`, LOCALIZED batch (updates = every doc of the
  *    median language, inserts = new ids in that language): candidate
  *    shards should track the batch's LOCALITY on the layout dims (the
  *    old versions live where the z-order put that language), not the
  *    corpus — the delta-load MERGE shape;
  *  - `upsertSharded`, SCATTERED batch (100 fixed ids spread across
  *    the id space): candidates bounded by the key count — the
  *    worst-case shape, priced so the contrast is on record;
  *  - replay of the localized MERGE (the crash-retry contract): rows
  *    replaced again, converging state, wall;
  *  - `evolveAddColumn` (a METADATA op — wall must stay constant in
  *    table size) + the widened append + a pruned read on the NEW
  *    column (pre-evolution shards skipped via NULL envelopes);
  *  - `readPrunedByPrefix` on the median language's first code point
  *    vs the full-scan `startsWith` contrast: candidates, files
  *    opened, rows read, wall.
  *
  * Bloom sizing note: the id bloom is sized off the ACTUAL per-shard
  * key count (m ≈ 16 bits/key rounded up to a power of two) — a fixed
  * m would saturate at 100× and route everything, which is a sizing
  * error, not a scale result.
  *
  * Usage: runMain graft.MutationScaleProbe [sfDir] [shards]
  */
object MutationScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val d = Tables(spark, dir, "documents")
    val total = d.count()
    val dict = Corpus.stringDimDict(d, "lang")
    val bounds = dict.agg(min(col("rank")).as("_min_lang"),
        max(col("rank")).as("_max_lang"))
      .crossJoin(d.agg(
        min(col("n_chars")).as("_min_n_chars"),
        max(col("n_chars")).as("_max_n_chars")))
    def lay(df: org.apache.spark.sql.DataFrame, keep: Seq[String]) =
      Corpus.zorderLayoutAgainstN(df, bounds, "doc_id",
        Seq("lang", "n_chars"), bits = 8, nShards = shards,
        keepCols = keep, dicts = Map("lang" -> dict))
        .drop("cell_lang", "cell_n_chars")
    val v = dict.join(dict.agg((max(col("rank")) / 2).cast("long")
      .as("rank")), Seq("rank")).head().getAs[String]("value")
    // id bloom sized off the real per-shard key count (16 bits/key)
    val bloomM = {
      val perShard = math.max(1L, total / shards)
      var m = 1024
      while (m < perShard * 16 && m < (1 << 24)) m <<= 1
      m
    }
    println(s"[mutation-probe] docs=$total shards=$shards lang='$v' " +
      s"bloom_m=$bloomM")

    // ---- 1. sharded MERGE, localized + scattered ----
    val up = "target/mutation_scale_probe/documents_z_up"
    Scan.writeSharded(spark,
      lay(d, Seq("lang", "n_chars", "source")), up,
      statCols = Seq("lang", "n_chars"), sortCol = Some("zvalue"),
      bloomKeyCol = Some("doc_id"), bloomM = bloomM, bloomK = 3,
      zTotalBits = Some(16), nShards = Some(shards),
      dicts = Map("lang" -> dict))
    val upd = d.filter(col("lang") === v)
      .withColumn("source", lit("merged"))
    val ins = d.filter(col("lang") === v)
      .withColumn("doc_id", col("doc_id") + 100000000L)
      .withColumn("source", lit("inserted"))
    val batch = lay(upd.unionByName(ins),
      Seq("lang", "n_chars", "source")).persist()
    val nBatch = batch.count()
    val ((c1, t1, r1), w1) = timed(Scan.upsertSharded(spark, up, batch,
      "doc_id", maxKeys = 1000000))
    println(f"[mutation-probe] merge-localized batch=$nBatch%8d " +
      f"cands=${c1.size}%3d/$shards touched=${t1.size}%3d " +
      f"replaced=$r1%8d wall=$w1%7.3f s")
    val ((c2, t2, r2), w2) = timed(Scan.upsertSharded(spark, up, batch,
      "doc_id", maxKeys = 1000000))
    println(f"[mutation-probe] merge-replay    batch=$nBatch%8d " +
      f"cands=${c2.size}%3d touched=${t2.size}%3d replaced=$r2%8d " +
      f"wall=$w2%7.3f s (converged re-run)")
    batch.unpersist()
    // hash-based sample: a modulus on raw ids aliases with the
    // synthetic data's attribute cycles (measured: the "scattered"
    // sample landed in ONE lang's shards at 100×) — xxhash64
    // decorrelates, making the sample genuinely scattered
    val scatterIds = d.filter(
        pmod(xxhash64(col("doc_id")), lit(total / 100)) === 7)
      .limit(100)
    val scatter = lay(scatterIds.withColumn("source", lit("scattered")),
      Seq("lang", "n_chars", "source")).persist()
    val nScatter = scatter.count()
    val ((c3, t3, r3), w3) = timed(Scan.upsertSharded(spark, up,
      scatter, "doc_id"))
    println(f"[mutation-probe] merge-scattered batch=$nScatter%8d " +
      f"cands=${c3.size}%3d/$shards touched=${t3.size}%3d " +
      f"replaced=$r3%8d wall=$w3%7.3f s")
    scatter.unpersist()

    // ---- 1b. deletion vectors: scattered takedown, deferred vs applied ----
    val dvIds = d.filter(
        pmod(xxhash64(col("doc_id")), lit(total / 100)) === 11)
      .limit(100).select("doc_id").collect().map(_.getLong(0)).toSeq
    val ((_, dvT, dvR), w3b) = timed(Scan.deleteByKeysDeferred(spark,
      up, dvIds))
    println(f"[mutation-probe] dv-mask         keys=${dvIds.size}%5d " +
      f"dv_shards=${dvT.size}%3d/$shards masked=$dvR%8d " +
      f"wall=$w3b%7.3f s (no shard rewritten)")
    val allShards = (0 until shards).toSeq
    val (_, w3c) = timed(Scan.readShards(spark, up, allShards).count())
    val ((dvA, dvPr), w3d) = timed(Scan.applyDeletionVectors(spark, up))
    val (_, w3e) = timed(Scan.readShards(spark, up, allShards).count())
    println(f"[mutation-probe] dv-read-tax     masked-read=$w3c%7.3f s " +
      f"clean-read=$w3e%7.3f s")
    println(f"[mutation-probe] dv-apply        shards=${dvA.size}%3d " +
      f"removed=$dvPr%8d wall=$w3d%7.3f s (the deferred rewrite)")

    // ---- 2. schema evolution + pruned read on the new column ----
    val evo = "target/mutation_scale_probe/documents_z_evo"
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val batch0 = d.filter(col("doc_id") % 7 === 0)
      .withColumn("quality", col("n_chars") % 100)
    Scan.writeSharded(spark, lay(corpus, Seq("lang", "n_chars")), evo,
      statCols = Seq("lang", "n_chars"), sortCol = Some("zvalue"),
      zTotalBits = Some(16), nShards = Some(shards),
      dicts = Map("lang" -> dict))
    val (_, w4) = timed(Scan.evolveAddColumn(spark, evo, "quality",
      org.apache.spark.sql.types.LongType))
    val (_, w5) = timed(Scan.appendSharded(spark,
      lay(batch0, Seq("lang", "n_chars", "quality")), evo, "doc_id"))
    val qCands = Scan.candidateShardsByStats(
      Scan.statsManifest(spark, evo), Seq(("quality", 0L, 49L)))
    val ((qn, qf), w6) = timed {
      val r = Scan.readPrunedByRange(spark, evo, Seq(("quality", 0L, 49L)))
      (r.filter(col("quality").between(0L, 49L)).count(),
        r.select(input_file_name()).distinct().count())
    }
    println(f"[mutation-probe] evolve-add-col  wall=$w4%7.3f s " +
      f"(metadata op); widened-append wall=$w5%7.3f s")
    println(f"[mutation-probe] evolved-pruned  cands=${qCands.size}%3d" +
      f"/$shards files=$qf%4d rows=$qn%8d wall=$w6%7.3f s " +
      "(pre-evolution shards skipped via NULL envelopes)")

    // ---- 2b. operability verbs: fsck / vacuum / generation ----
    val (sh, w6b) = timed(Scan.fsckTable(spark, evo))
    val (dp, w6c) = timed(Scan.fsckTable(spark, evo, deep = true))
    val (_, w6d) = timed(Scan.vacuumTable(spark, evo))
    val (gen, w6e) = timed(Scan.tableGeneration(spark, evo))
    println(f"[mutation-probe] ops             fsck=${w6b}%6.3f s " +
      f"(${sh.size} findings) fsck-deep=$w6c%6.3f s (${dp.size}) " +
      f"vacuum=$w6d%6.3f s gen=$gen%3d in $w6e%6.4f s")

    // ---- 3. prefix routing vs full scan ----
    val pfx = v.substring(0, 1)
    val pCands = Scan.candidateShardsByPrefix(
      Scan.statsManifest(spark, evo), "lang", pfx)
    val ((pn, pf), w7) = timed {
      val r = Scan.readPrunedByPrefix(spark, evo, "lang", pfx)
      (r.count(), r.select(input_file_name()).distinct().count())
    }
    val (fn, w8) = timed(spark.read.parquet(evo)
      .filter(col("lang").startsWith(pfx)).count())
    println(f"[mutation-probe] prefix-pruned   '$pfx%%' " +
      f"cands=${pCands.size}%3d/$shards files=$pf%4d rows=$pn%8d " +
      f"wall=$w7%7.3f s")
    println(f"[mutation-probe] prefix-fullscan '$pfx%%' rows=$fn%8d " +
      f"wall=$w8%7.3f s")
    spark.stop()
  }
}
