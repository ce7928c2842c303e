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

  /** Fingerprint of an already-canonicalized text. */
  def fp(s: UTF8String, bits: Int): Long = {
    val toks = s.toString.split(" ", -1)
    val counts = new Array[Int](bits)
    var t = 0
    while (t < toks.length) {
      val m = SimhashBits.mask(UTF8String.fromString(toks(t)))
      var i = 1
      while (i <= bits) {
        if (((m >> (48 - i)) & 1L) != 0L) counts(i - 1) += 1
        i += 1
      }
      t += 1
    }
    val n = toks.length
    var f = 0L
    var i = 1
    while (i <= bits) {
      if (2 * counts(i - 1) >= n) f |= 1L << (bits - i)
      i += 1
    }
    f
  }
}
