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
}
