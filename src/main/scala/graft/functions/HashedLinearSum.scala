package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick linear-model accumulator in ONE fused pass:
  * `[Σ w(token), n_tokens]` over the space-separated tokens of the
  * (already canonicalized) input, where `w(token)` is the big-endian
  * unsigned 32-bit head of `md5("<salt>|" + token)` — the integer form of
  * the hashed weight, summed exactly so the caller performs the single
  * terminal division that turns it into a mean weight
  * ([[graft.ext.TextAnalysis.hashedLinearScore]]).
  *
  * Replaces the `aggregate(transform(split(...)))` higher-order chain,
  * which Catalyst evaluates with per-element interpreted lambdas OUTSIDE
  * whole-stage codegen and which materializes the token array. Here
  * scoring is a straight-line loop over the UTF8String — no array, no
  * lambda frames — and the expression participates in codegen like the
  * rest of the [[MinhashSigs]] family.
  *
  * Token boundaries replicate `split(normalized, " ")`: tokens are the
  * maximal runs between single spaces, and the empty input yields ONE
  * empty token (`split("", " ") = [""]`), hashed like any other.
  */
case class HashedLinearSum(child: Expression, salt: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_linear_sum requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hashed_linear_sum"

  override protected def nullSafeEval(input: Any): Any =
    HashedLinearSum.sumAndCount(input.asInstanceOf[UTF8String], salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedLinearSum.sumAndCount($c, $saltRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearSum =
    copy(child = newChild)
}

object HashedLinearSum {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def prefix(salt: String): Array[Byte] =
    prefixCache.computeIfAbsent(salt, s =>
      (s + "|").getBytes(StandardCharsets.UTF_8))

  /** `[Σ slice32(md5(salt|token)), token count]` over space-separated
    * tokens; operates on the raw UTF-8 bytes (a space is one byte in
    * UTF-8, so byte slicing between 0x20s is exact tokenization of the
    * canonical form).
    */
  def sumAndCount(s: UTF8String, salt: String): UnsafeArrayData = {
    val bytes = s.getBytes
    val pfx = prefix(salt)
    val md = digests.get()
    var sum = 0L
    var n = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(pfx)
        md.update(bytes, start, i - start)
        val d = md.digest()
        sum += ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        n += 1
        start = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(sum, n))
  }
}
