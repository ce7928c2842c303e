package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest loop needs: streaming micro-batches and delta appends
  * (`DeltaStream`, `Merge.upsert`) each add a few files, and after enough
  * batches a 100 TB table is millions of KB-sized parquet files whose
  * per-file open/footer cost dominates every scan. `compact` rewrites a
  * parquet directory into ⌈bytes / targetBytes⌉ files sized off the ACTUAL
  * on-disk footprint (no rows are collected, no data is interpreted — one
  * `FileSystem` metadata sweep decides the file count).
  *
  * The rewrite goes through [[graft.dw.Merge.atomicOverwrite]]'s
  * write-to-temp + double-rename swap, so readers never observe a partial
  * directory and a crash at any point leaves a recoverable state
  * (`Merge.recover`). Round-robin repartition gives uniformly-sized output
  * files regardless of input skew; pass `sortCols` to instead
  * range-partition + sort-within — clustering the rewrite by a scan key so
  * downstream predicate pushdown skips whole files (the layout half of the
  * compaction, à la OPTIMIZE ... ZORDER's 1-D case).
  *
  * Returns (filesBefore, filesAfter-target). Skips (returns unchanged
  * counts) when the directory is already at or below the target count —
  * compaction must be idempotent-cheap enough to run on a schedule.
  */
object Compaction {

  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): (Int, Int) = {
    require(targetBytes > 0, "need targetBytes > 0")
    graft.dw.Merge.recover(spark, dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    val bytes = dataFiles.map(_.getLen).sum
    val nBefore = dataFiles.size
    val nTarget = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (nBefore <= nTarget) return (nBefore, nBefore)
    val df = spark.read.parquet(dir)
    val laid =
      if (sortCols.isEmpty) df.repartition(nTarget)
      else df.repartitionByRange(nTarget,
        sortCols.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    graft.dw.Merge.atomicOverwrite(spark, laid, dir)
    (nBefore, nTarget)
  }

  /** Compaction for a SHARD-PARTITIONED table with manifest sidecars
    * ([[graft.util.Scan]]'s layout): rewrites each `shard=N` directory's
    * accumulated small files (streaming appends land a file per batch)
    * back to one file per shard, sorted within the file by `sortCol`
    * when given (the z-order curve position), and RECOMPUTES the stats +
    * bloom manifests from the rewritten files INSIDE THE SAME atomic
    * swap — data and manifests publish together, so a compacted table
    * can never strand a stale sidecar describing files that no longer
    * exist (the round-13 gap: `compact` alone silently invalidated the
    * x156/x159 sidecars). Manifest configuration (stats columns, bloom
    * key/m/k) is recovered from the existing sidecars — a compaction
    * never changes what the manifests cover, only which files they
    * describe.
    *
    * Skips (returns unchanged counts) when no shard directory holds more
    * than one data file — idempotent-cheap on a schedule, like
    * [[compact]]. Returns (dataFilesBefore, dataFilesAfter).
    *
    * Scale shape: one shard-keyed exchange + the per-shard manifest
    * aggregates — all embarrassingly parallel per shard; the shard count
    * (not the file count) bounds every post-shuffle stage.
    */
  /** `maxRecordsPerFile > 0` bounds each rewritten shard to a DIRECTORY
    * of files of at most that many rows instead of exactly one — the
    * per-shard-bytes safety valve for a growing table whose shard count
    * is frozen: file sizes stay bounded across any number of appends
    * even before a re-shard ([[reshardSharded]]) re-lays the table out.
    */
  def compactSharded(spark: SparkSession, dir: String,
      shardCol: String = "shard",
      sortCol: Option[String] = None,
      maxRecordsPerFile: Long = 0L): (Int, Int) =
      Scan.withSidecarCtx { Scan.withWriterLease(spark, dir) {
    graft.dw.Merge.recover(spark, dir)
    Scan.recoverPendingDelete(spark, dir, shardCol)
    // merge-on-read contract: compaction is where deferred deletes
    // become physical — apply the pending deletion vector (targeted:
    // only the shards it names) before looking at file counts
    Scan.applyDeletionVectors(spark, dir, shardCol, sortCol)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shardDirs = fs.listStatus(p).toSeq.filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$shardCol="))
    val perShard = shardDirs.map { d =>
      fs.listStatus(d.getPath).count(s => s.isFile
        && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    }
    val nBefore = perShard.sum
    if (!perShard.exists(_ > 1)) {
      // nothing to rewrite, but the manifests may still be LOOSE: an
      // append that created a brand-new single-file shard folds
      // `_stale_rows` without breaching any file count, and skipping
      // the refresh here would leave a staleness-triggered caller
      // (`maxStaleFraction` mounts) re-triggering a no-op compact on
      // every subsequent batch, forever
      if (Scan.manifestStaleness(spark, dir) > 0)
        Scan.refreshManifests(spark, dir, shardCol = shardCol)
      return (nBefore, nBefore)
    }
    // configuration from the durable meta sidecar when present
    // (recovery-window tables may hold ONLY meta + data — the heal
    // path), sidecar sniffing otherwise (pre-meta tables)
    val meta = Scan.readMeta(spark, dir)
    val statCols = meta.map(_.statCols).getOrElse(
      spark.read.parquet(s"$dir/${Scan.StatsSidecar}")
        .columns.toSeq.filter(_.endsWith("_min")).map(_.dropRight(4)))
    val bloomCfg = meta.map(m => m.bloomKey.map((_, m.bloomM, m.bloomK)))
      .getOrElse {
        if (!fs.exists(new Path(s"$dir/${Scan.BloomSidecar}"))) None
        else {
          val r = spark.read.parquet(s"$dir/${Scan.BloomSidecar}")
            .select("key_col", "m", "k").limit(1).head()
          Some((r.getString(0), r.getInt(1), r.getInt(2)))
        }
      }
    val sort = sortCol.orElse(meta.flatMap(_.sortCol))
    // dict sidecars (frozen string-dim frames) must survive the swap:
    // materialize them off the old directory before it is replaced
    val dicts = Scan.readDicts(spark, dir).map { case (c, d) =>
      c -> d.persist()
    }
    dicts.values.foreach(_.count())
    // declared-schema read: a compaction after evolveAddColumn widens
    // every pre-evolution file for good (null-filled on read, written
    // wide), after which the declared schema and the files agree
    val df = Scan.readTable(spark, dir)
    // one atomic swap republishes data + exact manifests + meta — the
    // same writeSharded protocol (meta first, append-mode data write),
    // so compaction preserves the crash-heal property it relies on
    try {
      graft.util.Scan.writeSharded(spark, df, dir, statCols, shardCol,
        sort, bloomCfg.map(_._1),
        bloomCfg.map(_._2).getOrElse(4096),
        bloomCfg.map(_._3).getOrElse(3),
        meta.flatMap(_.zTotalBits), meta.flatMap(_.nShards),
        maxRecordsPerFile, dicts)
    } finally dicts.values.foreach(_.unpersist())
    (nBefore, shardDirs.size)
      } }

  /** TARGETED compaction — rewrite ONLY the shards whose data-file
    * count exceeds `maxFilesPerShard`, through the pending/`_COMMIT`
    * protocol ([[graft.util.Scan.rewriteShards]]): each breaching
    * shard's accumulated batch files become one file (or
    * `maxRecordsPerFile`-bounded), its manifest rows recompute exactly
    * and its staleness zeroes, and every OTHER shard's files and
    * manifest rows pass through untouched. This is the maintenance
    * economics a 100 TB table requires: [[compactSharded]]'s full
    * republish re-reads and re-writes the whole table to fix one hot
    * shard's small files — work ∝ table; the targeted form is work ∝
    * breaching shards, which is what a streaming mount's per-batch
    * check can afford to trigger routinely. Pending deletion vectors
    * on the breaching shards become physical in the same rewrite
    * (and only those — a full [[graft.util.Scan.applyDeletionVectors]]
    * stays the explicit verb).
    *
    * Returns (breaching shard ids, data files before across them).
    */
  def compactShardsTargeted(spark: SparkSession, dir: String,
      maxFilesPerShard: Int = 1, shardCol: String = "shard",
      sortCol: Option[String] = None,
      maxRecordsPerFile: Long = 0L): (Seq[Int], Int) =
      Scan.withSidecarCtx { Scan.withWriterLease(spark, dir) {
    require(maxFilesPerShard >= 1, "need maxFilesPerShard >= 1")
    graft.dw.Merge.recover(spark, dir)
    Scan.recoverPendingDelete(spark, dir, shardCol)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val breaching = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$shardCol="))
      .map { d =>
        val n = fs.listStatus(d.getPath).count(s => s.isFile
          && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        (d.getPath.getName.stripPrefix(s"$shardCol=").toInt, n)
      }
      .filter(_._2 > maxFilesPerShard)
    if (breaching.isEmpty) return (Nil, 0)
    val shards = breaching.map(_._1).sorted
    Scan.rewriteShards(spark, dir, shards, shardCol, sortCol,
      maxRecordsPerFile)
    Scan.logEntry(spark, dir, "compact_targeted",
      s"shards=${shards.size} files_before=${breaching.map(_._2).sum}")
    (shards, breaching.map(_._2).sum)
      } }

  /** SHARD-COUNT EVOLUTION — the re-layout a growing table eventually
    * needs: `nShards` is frozen at publication and appends preserve it,
    * so per-shard bytes grow without bound; this re-maps every row's
    * shard from its PERSISTED curve position (`zvalue * newNShards >>
    * z_total_bits` — the same interleave arithmetic the layout used, so
    * curve locality and the per-shard envelope tightness carry over)
    * and republishes data + rebuilt manifests + updated meta in ONE
    * atomic swap. Pruned reads are TRANSPARENT across the re-shard (the
    * manifests describe the new shards; candidates just enumerate
    * differently — spec-pinned in `CompactionSpec`).
    *
    * Requires the table's meta sidecar to carry `z_total_bits`
    * ([[graft.util.Scan.writeSharded]]'s `zTotalBits` — every layout
    * publisher in this repo passes it); a table without one predates
    * the meta protocol and must be re-published through `writeSharded`.
    *
    * Scale shape: one full-table shard-keyed exchange + the manifest
    * aggregates — the same cost as a compaction, run as rarely (when
    * per-shard bytes breach the target, typically after ~2× growth).
    */
  def reshardSharded(spark: SparkSession, dir: String, newNShards: Int,
      shardCol: String = "shard", zvalueCol: String = "zvalue")
      : (Int, Int) =
      Scan.withSidecarCtx { Scan.withWriterLease(spark, dir) {
    require(newNShards >= 1, "need newNShards >= 1")
    graft.dw.Merge.recover(spark, dir)
    Scan.recoverPendingDelete(spark, dir, shardCol)
    // apply any pending deletion vector before re-laying out: the DV
    // names OLD shard numbers, which the re-shard is about to retire
    Scan.applyDeletionVectors(spark, dir, shardCol)
    val meta = Scan.readMeta(spark, dir).getOrElse(sys.error(
      s"reshardSharded: $dir has no ${Scan.MetaSidecar} sidecar — " +
        "re-publish through writeSharded(zTotalBits=…) first"))
    val shift = meta.zTotalBits.getOrElse(sys.error(
      s"reshardSharded: $dir's meta lacks z_total_bits — the table " +
        "was not published from a z-order layout"))
    val oldN = meta.nShards.getOrElse(-1)
    import org.apache.spark.sql.functions.{col, shiftright}
    val dicts = Scan.readDicts(spark, dir).map { case (c, d) =>
      c -> d.persist()
    }
    dicts.values.foreach(_.count())
    val relaid = Scan.readTable(spark, dir).withColumn(shardCol,
      shiftright(col(zvalueCol) * newNShards, shift).cast("int"))
    try {
      graft.util.Scan.writeSharded(spark, relaid, dir, meta.statCols,
        shardCol, meta.sortCol.orElse(Some(zvalueCol)), meta.bloomKey,
        meta.bloomM, meta.bloomK, Some(shift), Some(newNShards),
        dicts = dicts)
    } finally dicts.values.foreach(_.unpersist())
    (oldN, newNShards)
  } }
}

