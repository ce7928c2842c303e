package graft.dw

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table storage for the big-table join paths.
  *
  * The reference's fact MERGE re-shuffles nothing only because its data is
  * tiny; at warehouse scale, every delta's anti-join against the fact table
  * would shuffle the entire fact by `ID_Event`. Bucketing the fact (and
  * staging the delta with the same bucketing) makes the upsert join
  * shuffle-free on the big side: both relations expose the same hash
  * partitioning, so SortMergeJoin reads buckets pairwise — the per-delta
  * cost becomes O(delta + fact scan) with zero exchange of fact rows.
  *
  * The same applies to any repeated equi-join on a stable key (fact↔fact
  * history joins, dedup against an ever-growing key set).
  */
object Bucketed {

  /** Write `df` as a bucketed, sorted managed table (replacing it). The
    * explicit drop also clears an orphaned location left by a crashed
    * previous write (resolved through the catalog — name case folding and
    * qualification — not by string-concatenating the warehouse dir), which
    * Overwrite mode alone refuses to reuse.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      org.apache.spark.sql.graftshim.shim.defaultTablePath(spark, table))
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Crash recovery for the metastore-rename swap: a kill between
    * `DROP $table` and `RENAME ${table}__next TO $table` leaves the merged
    * data complete under `__next` — restore it. Mirrors [[Merge.recover]]
    * for the path-based protocol.
    */
  def recoverBucketed(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(s"${table}__next")) {
      // no catalog entry for `table` means its default location, if present,
      // is an orphan (e.g. metastore lost after a crash) — RENAME validates
      // the target location is free, so clear it first
      val loc = new org.apache.hadoop.fs.Path(
        org.apache.spark.sql.graftshim.shim.defaultTablePath(spark, table))
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      spark.sql(s"ALTER TABLE ${table}__next RENAME TO $table")
    }

  /** MERGE into a bucketed table: same left-anti + union semantics as
    * [[Merge.upsert]], but both sides stay bucket-local — no exchange on
    * the existing (big) side. The staged delta is written bucketed first so
    * the join is co-partitioned.
    */
  def mergeIntoBucketed(spark: SparkSession, table: String, staged: DataFrame,
      key: String, buckets: Int): Unit = {
    recoverBucketed(spark, table)
    val stagingTable = s"${table}__staged"
    writeBucketed(staged, stagingTable, key, buckets)
    val merged = Merge.upsert(spark.table(table), spark.table(stagingTable), key)
    // materialize to a replacement table, then swap names (metastore rename)
    val tmpTable = s"${table}__next"
    writeBucketed(merged, tmpTable, key, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmpTable RENAME TO $table")
    spark.sql(s"DROP TABLE IF EXISTS $stagingTable")
  }
}
