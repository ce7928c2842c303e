package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent aggregate helpers.
  *
  * Double sums are not associative, so a distributed partial-aggregate can
  * differ from a single-threaded oracle in the last ulps — enough to flip a
  * rounded digit on ~1e9-magnitude sums over 1e5+ rows. Quantizing each
  * value to an integer count of 10^-scale units first makes the sum exact
  * and order-independent on any partitioning. This matters *more* at
  * 100 TB: reproducible results regardless of partition count / AQE
  * decisions.
  *
  * The quantization is `sign(x)·floor(|x|·10^scale + 0.5)` summed as a
  * 64-bit integer — a pure IEEE-double expression both engines evaluate
  * identically, then an associative long sum. The sign-aware form rounds
  * half-units AWAY FROM ZERO for negatives too (−0.125 at scale 2 → −13
  * units, not −12) — depth/longitude/magnitude inputs can all be
  * negative — restoring the original `sum(CAST(x AS DECIMAL(18,s)))`
  * formulation's HALF_UP symmetry at ~2.5× less cost (Spark's
  * double→decimal cast routes every value through `Double.toString` +
  * `BigDecimal`). Tie DETECTION still follows the IEEE binary value (1.005
  * scales to 100.4999…, not a tie), unlike the decimal cast's
  * shortest-string rounding; since both engines evaluate this same
  * expression, cross-engine agreement is unconditional either way.
  *
  * Domain bound, by design: the summed magnitude must stay below 2^63
  * quantized units — e.g. 10^11 rows averaging 10^5 at scale 2 still fits
  * with 4 orders of magnitude to spare. Past that, fall back to a
  * DecimalType sum.
  */
object Exact {

  /** Exact sum: per-value fixed-point quantization (round half away from
    * zero at `scale` digits), exact integer sum, double out.
    */
  def dsum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    // the product must be cast to LONG before summing: signum is DoubleType,
    // so the bare product would sum as doubles — exact only below 2^53 units,
    // not the documented 2^63 — and diverge from dsumSql's CAST(... AS BIGINT)
    sum((signum(c) * floor(abs(c) * f + lit(0.5))).cast(LongType))
      .cast(DoubleType) / f
  }

  /** Exact average built from the exact sum (same double division both engines). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** DuckDB oracle-side SQL for [[dsum]] — literally the same arithmetic. */
  def dsumSql(col: String, scale: Int = 2): String = {
    val f = math.pow(10, scale)
    s"CAST(sum(CAST(sign(($col)) * floor(abs($col) * $f + 0.5) AS BIGINT)) AS DOUBLE) / $f"
  }

  /** DuckDB oracle-side SQL for [[davg]]. */
  def davgSql(col: String, scale: Int = 2): String =
    s"${dsumSql(col, scale)} / count($col)"
}
