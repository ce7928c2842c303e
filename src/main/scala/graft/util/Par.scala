package graft.util

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-amplifying operators (shingle explodes,
  * O(n²) pair joins): a documents/embeddings table is only a few MB per
  * 100k rows on disk, so a parquet scan can yield fewer partitions than
  * cores and a 100×-amplifying downstream stage would run single-threaded.
  *
  * `spread` repartitions round-robin up to the default parallelism, and is
  * a no-op when the scan is already wide (the 100 TB case — there the file
  * splits provide the parallelism and an extra shuffle would be pure
  * waste).
  *
  * Width is decided from the optimizer's size estimate
  * (`optimizedPlan.stats`), not `df.rdd.getNumPartitions`: touching the RDD
  * forces full physical planning (+ codegen) of a subtree that is thrown
  * away and re-planned under the repartition — pure driver-side waste on
  * large plans. The stats estimate is exact enough for the only question
  * asked here: "is this source narrower than the machine".
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val par = sess.sparkContext.defaultParallelism
    val maxPartitionBytes = JavaUtils.byteStringAsBytes(
      sess.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // sources without stats report the defaultSizeInBytes sentinel
    // (effectively Long.MaxValue), and join/explode estimates can propagate
    // past it — both would silently make spread a no-op exactly where a
    // narrow source needs it. Estimates at or beyond the sentinel are
    // UNKNOWN: fall back to the physical partition count, paying one
    // planning of the subtree only on this path.
    val sentinel = BigInt(sess.conf.get("spark.sql.defaultSizeInBytes",
      Long.MaxValue.toString))
    if (size < sentinel) {
      val estParts = size / maxPartitionBytes + 1
      if (estParts < par) df.repartition(par) else df
    } else if (df.rdd.getNumPartitions < par) df.repartition(par)
    else df
  }
}
