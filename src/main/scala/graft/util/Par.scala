package graft.util

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
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
