package graft

import graft.util.{Scan, Tables}
import org.apache.spark.sql.functions._

/** Evidence that the STRING-predicated skipping stack (x164–x168) routes
  * real I/O — the round-15 surface: dictionary-rank string dims in the
  * curve, native string min/max envelopes, string bloom keys, combined
  * range∩key candidate intersection, and the DAX fact published sharded
  * with its type label as a string dim. Three tables:
  *
  *  1. documents laid out on (lang, n_chars): `lang = median` via string
  *     envelopes; the combined `lang = v AND n_chars ∈ [lo, hi]` via
  *     stats ∩ bloom;
  *  2. the same table re-sharded (×4): the identical predicate after a
  *     shard-count evolution — per-shard bytes bounded, skip preserved;
  *  3. events-as-fact on (event_type, ts_us): the reference's own
  *     analytic shape (`LB_type = "earthquake"` — string equality on the
  *     type label) answered off bloom-maybe shards only, plus the
  *     time-ranged variant off the stats envelopes.
  *
  * For each read: files contributing rows, rows read (task input
  * metrics), wall vs the full scan. Not part of the driver contract.
  *
  * Usage: runMain graft.StringPrunedProbe [sfDir] [reps] [shards]
  */
object StringPrunedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val shards = args.drop(2).headOption.map(_.toInt).getOrElse(32)
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    def report(tag: String, total: Long,
        mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val files = mk().select(input_file_name()).distinct().count()
      val runs = (1 to reps).map { _ =>
        Probe.measureScan(spark) {
          mk().groupBy().agg(count(lit(1)).as("n")).head().getLong(0)
        }
      }
      val med = runs.map(_._1).sorted.apply((reps - 1) / 2)
      val medRows = runs.map(_._3).sorted.apply((reps - 1) / 2)
      println(f"[string-probe] $tag%-18s matches=${runs.head._2}%8d " +
        f"files_opened=$files%4d rows_read=$medRows%10d " +
        f"(${medRows * 100.0 / total}%5.1f%%) median=$med%6.3f s reps=" +
        runs.map(r => f"${r._1}%.3f").mkString("[", ", ", "]"))
    }

    // ---- 1. documents on (lang [string dim], n_chars) ----
    val docsTable = "target/string_pruned_probe/documents_z"
    val d = Tables(spark, dir, "documents")
    val laid = graft.ext.Corpus.zorderLayoutN(d, "doc_id",
      Seq("lang", "n_chars"), bits = 8, nShards = shards,
      keepCols = Seq("lang", "source", "n_chars"))
      .drop("cell_lang", "cell_n_chars")
    Scan.writeSharded(spark, laid, docsTable,
      statCols = Seq("lang", "n_chars"), sortCol = Some("zvalue"),
      bloomKeyCol = Some("lang"), bloomM = 1024,
      zTotalBits = Some(16), nShards = Some(shards))
    val dict = graft.ext.Corpus.stringDimDict(d, "lang")
    val v = dict.join(dict.agg((max(col("rank")) / 2).cast("long")
      .as("rank")), Seq("rank")).head().getAs[String]("value")
    val nb = d.agg(min("n_chars"), max("n_chars")).head()
    val (lo, hi) = (nb.getLong(0) + (nb.getLong(1) - nb.getLong(0)) * 30 / 100,
      nb.getLong(0) + (nb.getLong(1) - nb.getLong(0)) * 70 / 100)
    val langRange: Seq[(String, Any, Any)] = Seq(("lang", v, v))
    val nRange: Seq[(String, Any, Any)] = Seq(("n_chars", lo, hi))
    val dTotal = spark.read.parquet(docsTable).count()
    val sCands = Scan.candidateShardsByStats(
      Scan.statsManifest(spark, docsTable), langRange)
    val kCands = Scan.candidateShardsByKeys(
      Scan.bloomManifest(spark, docsTable), Seq(v))
    val iCands = Scan.candidateShardsByStats(
      Scan.statsManifest(spark, docsTable), nRange).intersect(kCands)
    println(s"[string-probe] docs lang='$v' stats_cands=${sCands.size}" +
      s"/$shards bloom_cands=${kCands.size} combined=${iCands.size}")
    // full-scan legs with parquet min/max pushdown OFF (every listed
    // file read whole — the raw contrast); pushdown-only legs show
    // Spark's own row-group skipping, which still LISTS all files and
    // reads every footer — the cost manifests remove at scale
    def noPD[T](body: => T): T = {
      spark.conf.set("spark.sql.parquet.filterPushdown", "false")
      try body
      finally spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    }
    noPD(report("doc-full-noPD", dTotal,
      () => spark.read.parquet(docsTable).filter(col("lang") === v)))
    report("doc-pushdown-only", dTotal,
      () => spark.read.parquet(docsTable).filter(col("lang") === v))
    report("doc-lang-pruned", dTotal,
      () => Scan.readPrunedByRange(spark, docsTable, langRange))
    noPD(report("doc-comb-noPD", dTotal,
      () => spark.read.parquet(docsTable)
        .filter(col("lang") === v && col("n_chars").between(lo, hi))))
    report("doc-comb-pushdown", dTotal,
      () => spark.read.parquet(docsTable)
        .filter(col("lang") === v && col("n_chars").between(lo, hi)))
    report("doc-combined", dTotal,
      () => Scan.readPruned(spark, docsTable, nRange, keys = Seq(v)))

    // ---- 2. the same predicate across a re-shard (×4) ----
    graft.util.Compaction.reshardSharded(spark, docsTable, shards * 4)
    val rCands = Scan.candidateShardsByStats(
      Scan.statsManifest(spark, docsTable), langRange)
    println(s"[string-probe] resharded to ${shards * 4}: " +
      s"lang_cands=${rCands.size}/${shards * 4}")
    report("doc-lang-resharded", dTotal,
      () => Scan.readPrunedByRange(spark, docsTable, langRange))

    // ---- 3. the DAX fact on (event_type [string dim], ts_us) ----
    val factTable = "target/string_pruned_probe/events_fact_z"
    val e = Tables(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val laidF = graft.ext.Corpus.zorderLayoutN(e, "event_id",
      Seq("event_type", "ts_us"), bits = 8, nShards = shards,
      keepCols = Seq("event_type", "ts_us", "value"))
      .drop("cell_event_type", "cell_ts_us")
    Scan.writeSharded(spark, laidF, factTable,
      statCols = Seq("event_type", "ts_us"), sortCol = Some("zvalue"),
      bloomKeyCol = Some("event_type"), bloomM = 1024,
      zTotalBits = Some(16), nShards = Some(shards))
    val t = e.agg(min(col("event_type"))).head().getString(0)
    val fTotal = spark.read.parquet(factTable).count()
    val fCands = Scan.candidateShardsByKeys(
      Scan.bloomManifest(spark, factTable), Seq(t))
    val tb = e.agg(min("ts_us"), max("ts_us")).head()
    val (t1, t2) = (tb.getLong(0) + (tb.getLong(1) - tb.getLong(0)) * 45 / 100,
      tb.getLong(0) + (tb.getLong(1) - tb.getLong(0)) * 55 / 100)
    val tRange: Seq[(String, Any, Any)] = Seq(("ts_us", t1, t2))
    val fComb = Scan.candidateShardsByStats(
      Scan.statsManifest(spark, factTable), tRange).intersect(fCands)
    println(s"[string-probe] fact type='$t' bloom_cands=${fCands.size}" +
      s"/$shards combined(ts∩type)=${fComb.size}")
    noPD(report("fact-full-noPD", fTotal,
      () => spark.read.parquet(factTable)
        .filter(col("event_type") === t)))
    report("fact-pushdown-only", fTotal,
      () => spark.read.parquet(factTable).filter(col("event_type") === t))
    report("fact-type-pruned", fTotal,
      () => Scan.readPrunedByKey(spark, factTable, "event_type", t))
    noPD(report("fact-dax-comb-noPD", fTotal,
      () => spark.read.parquet(factTable).filter(
        col("event_type") === t && col("ts_us").between(t1, t2))))
    report("fact-dax-combined", fTotal,
      () => Scan.readPruned(spark, factTable, tRange, keys = Seq(t)))
    spark.stop()
  }
}
