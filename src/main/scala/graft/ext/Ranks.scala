package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order statistics without a per-group total-order window.
  *
  * `Window.partitionBy(group).orderBy(value)` assigns each GROUP to one
  * reducer: correct at any size, but parallelism is bounded by group count —
  * five language strata over a 100 TB corpus means five tasks each sorting
  * ~20 TB. The two-pass shape here keeps parallelism bounded by the shuffle
  * partition count instead:
  *
  *  1. range-partition rows on `(group, value)` — Spark's RangePartitioner
  *     samples boundaries, so a single group spreads over many partitions
  *     while rows with EQUAL `(group, value)` keys always co-locate (range
  *     boundary assignment is a binary search on the full sort key);
  *  2. rank locally inside each `(partition, group)` slice — the slice
  *     window's key includes the partition id, so one group yields as many
  *     window groups as it spans range partitions;
  *  3. add per-slice prefix-sum offsets (a tiny `partitions × groups`
  *     aggregate, broadcast back) to turn local ranks into global ranks.
  *
  * The offset table's own prefix-sum window IS per-group single-task, but
  * over `partitions` rows per group, not corpus rows — driver-side-small by
  * construction. Equal values may receive their tied ranks in a different
  * permutation than a single global window would produce; any consumer that
  * reads a VALUE at a rank (quantiles) is unaffected because permuted ties
  * are equal values.
  */
private[graft] object Ranks {

  /** Rank `df`'s rows by `_v` ascending within `groupCol`, two-pass.
    *
    * Input: columns (`groupCol`, `_v`), `_v` non-null. Output adds
    * `_pid` (range partition id — kept so callers/probes can assert the
    * spread), `_n` (group size) and `_rn` (1-based global rank in the
    * group).
    */
  def byValue(df: DataFrame, groupCol: String): DataFrame = {
    val nParts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(nParts, col(groupCol).asc, col("_v").asc)
      .withColumn("_pid", spark_partition_id())
    // per-slice row counts: ≤ nParts × groups rows, aggregated map-side on
    // the range exchange's output (the exchange is shared with the ranked
    // branch via ReuseExchange — the corpus is range-shuffled once)
    val offsets = parted
      .groupBy(col("_pid"), col(groupCol))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("_pid").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c"))
        .over(Window.partitionBy(col(groupCol))))
      .select(col("_pid"), col(groupCol), col("_off"), col("_n"))
    val slice = Window.partitionBy(col("_pid"), col(groupCol))
      .orderBy(col("_v").asc)
    parted
      .withColumn("_lrn", row_number().over(slice))
      .join(broadcast(offsets), Seq("_pid", groupCol))
      .withColumn("_rn", col("_lrn") + col("_off"))
      .drop("_lrn", "_off")
  }
}
