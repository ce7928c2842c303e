package graft.dw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension construction: distinct natural keys → dense sequential
  * surrogate IDs in sort order; delta loads continue from the current max.
  *
  * Reference behavior: `Full Load Scripts/dw_full_load2.py:37-39`
  * (`enumerate(sorted(values), start=1)` over a collected list) and the
  * delta continuation `Delta Load Scripts/dw2_delta_load2.py:32-34,70-73,179`.
  *
  * Spark-first shape: the reference's `Distinct → ToList → enumerate` would
  * serialize every distinct value through one element — a scaling cliff.
  * Here it is `distinct()` (map-side partial aggregation, shuffled by key)
  * followed by `row_number()` over a global sort. The single-partition
  * window is deliberate and safe: it runs over the *post-distinct dimension
  * values* (bounded, tiny — network codes, category names, countries), never
  * over fact rows. NULL sorts first, making the engine strictly more defined
  * than the reference (Python `sorted()` raises on None among strings,
  * SURVEY §1.4/§7.4.5).
  */
object DimBuilder {

  /** Distinct `keyCols` tuples of `src` numbered 1..n in sort order.
    *
    * `maxDimRows` makes the bounded-cardinality contract of the
    * single-partition window mechanical: the guard is fused into the id
    * projection (zero extra passes or actions), so a caller pointing this
    * at an unbounded key — where the global sort WOULD be the scaling
    * cliff — fails with a named error instead of silently funneling the
    * world through one partition.
    */
  def build(src: DataFrame, keyCols: Seq[Column], outCols: Seq[String],
      idCol: String, startId: Long = 1L,
      maxDimRows: Long = DefaultMaxDimRows): DataFrame = {
    val distinct = src
      .select(keyCols.zip(outCols).map { case (c, n) => c.as(n) }: _*)
      .distinct()
    val w = Window.orderBy(outCols.map(c => col(c).asc_nulls_first): _*)
    distinct
      .withColumn("_rn", row_number().over(w).cast("long") + lit(startId - 1L))
      .withColumn(idCol, when(col("_rn") <= startId - 1L + maxDimRows, col("_rn"))
        .otherwise(raise_error(lit(
          s"DimBuilder.build: dimension exceeds maxDimRows=$maxDimRows" +
            " distinct values — this surrogate-id window is single-partition" +
            " by design for BOUNDED dims; raise maxDimRows only if that" +
            " cardinality is intended")).cast("long")))
      .select((idCol +: outCols).map(col): _*)
  }

  /** Default [[build]] cardinality bound — far above any real dimension
    * (the reference's dims are networks/categories/countries, ≤10⁴), low
    * enough to catch a fact-keyed mistake before it becomes a one-partition
    * sort of the corpus.
    */
  val DefaultMaxDimRows: Long = 10000000L

  /** Null-safe multi-column anti join (J4): Python's `value not in dict`
    * treats None as an ordinary key, so NULL dimension values must compare
    * equal — SQL `=` would re-insert a NULL row on every delta. `<=>` keeps
    * the anti join exact AND still hash-joinable (null-safe equality is a
    * valid equi-join key for broadcast/shuffled hash).
    */
  def antiJoinNullSafe(left: DataFrame, right: DataFrame, cols: Seq[String]): DataFrame = {
    val r = right.select(cols.map(c => col(c).as(s"__r_$c")): _*)
    val cond = cols.map(c => left(c) <=> r(s"__r_$c")).reduce(_ && _)
    left.join(r, cond, "left_anti")
  }

  /** Delta extension (`dw2_delta_load2.py:173-187`): values absent from the
    * existing dimension get IDs continuing after `maxExistingId`. Returns
    * only the NEW rows (the reference appends them to the table).
    */
  def extend(existing: DataFrame, src: DataFrame, keyCols: Seq[Column],
      outCols: Seq[String], idCol: String): DataFrame = {
    val maxId = existing.agg(max(col(idCol))).first() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val fresh = antiJoinNullSafe(
      src.select(keyCols.zip(outCols).map { case (c, n) => c.as(n) }: _*).distinct(),
      existing, outCols)
    build(fresh, outCols.map(col), outCols, idCol, startId = maxId + 1L)
  }
}
