package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document SimHash fingerprint in ONE pass: per-token
  * [[SimhashBits]] vote masks accumulated into per-bit counts, packed into
  * the `bits`-wide fingerprint — exactly the
  * `sum(±1 votes) → sign → pack` aggregate, fused per document.
  *
  * Replaces the exploded (doc, token) frame + `bits`-column HashAggregate
  * with a map-only projection: no shuffle, embarrassingly parallel, the
  * right shape at any corpus size. Token semantics replicate
  * `split(normalizedText, " ")` (Java regex split, limit -1): the
  * canonicalized empty string contributes its single empty token, matching
  * both the exploded formulation and the DuckDB
  * `unnest(string_split(...))` oracle.
  *
  * The vote for (1-based) nibble `i` is bit `48 - i` of the token mask;
  * a non-negative vote sum (`2·count ≥ n`) sets fingerprint bit
  * `bits - i` — identical to the aggregate form for every `bits ≤ 48`.
  */
case class SimhashFp(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 48, "bits must be in 1..48")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any =
    SimhashFp.fp(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashFp.fp($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)
}

object SimhashFp {

  /** Fingerprint of an already-canonicalized text. Tokenizes in place on
    * the UTF-8 bytes: 0x20 never occurs inside a multi-byte UTF-8
    * sequence, so splitting the raw bytes on the space byte is exactly
    * `split(" ", -1)` (including the single empty token of an empty
    * string) without materializing any per-token String.
    */
  def fp(s: UTF8String, bits: Int): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](bits)
    var n = 0
    var start = 0
    var p = 0
    while (p <= bytes.length) {
      if (p == bytes.length || bytes(p) == ' '.toByte) {
        val m = SimhashBits.mask(bytes, start, p - start)
        n += 1
        var i = 1
        while (i <= bits) {
          if (((m >> (48 - i)) & 1L) != 0L) counts(i - 1) += 1
          i += 1
        }
        start = p + 1
      }
      p += 1
    }
    var f = 0L
    var i = 1
    while (i <= bits) {
      if (2 * counts(i - 1) >= n) f |= 1L << (bits - i)
      i += 1
    }
    f
  }
}
