package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent aggregate helpers.
  *
  * Double sums are not associative, so a distributed partial-aggregate can
  * differ from a single-threaded oracle in the last ulps — enough to flip a
  * rounded digit on ~1e9-magnitude sums over 1e5+ rows. Casting each value to
  * a fixed-scale decimal first makes the sum exact and order-independent on
  * any partitioning (Spark and DuckDB then agree bit-for-bit after the final
  * cast back to double). This matters *more* at 100 TB: reproducible results
  * regardless of partition count / AQE decisions.
  */
object Exact {

  /** Exact sum: per-value decimal quantization, exact decimal sum, double out. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average built from the exact sum (same double division both engines). */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c))

  /** DuckDB oracle-side SQL for [[dsum]]. */
  def dsumSql(col: String, scale: Int = 2): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** DuckDB oracle-side SQL for [[davg]]. */
  def davgSql(col: String, scale: Int = 2): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE) / count($col)"
}
