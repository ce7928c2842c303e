package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DISTINCT 60-bit md5 word-`n`-gram slices of a canonical document
  * in ONE fused pass — [[GramHashes]]'s device for the KMV sketch's hash
  * family: byte-identical to
  * `conv(substring(md5(gram), 1, 15), 16, 10)` over
  * `array_distinct(wordNgrams(tokens(text)))` (the first 15 hex nibbles
  * of the digest = the top 60 bits, always non-negative in a long).
  * Output ascending; the KMV consumer re-sorts per group anyway.
  */
case class GramMd5Sixty(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "need n > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_md5_sixty requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_md5_sixty"

  override protected def nullSafeEval(input: Any): Any =
    GramMd5Sixty.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramMd5Sixty.hashes($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): GramMd5Sixty = copy(child = newChild)
}

object GramMd5Sixty {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Sorted distinct 60-bit md5 slices of `s`'s word-n-gram set. */
  def hashes(s: UTF8String, n: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    var nt = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nt += 1; i += 1 }
    val starts = new Array[Int](nt + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nt) = bytes.length + 1
    val m = math.max(nt - n + 1, 1)
    val md = digests.get()
    val h = new Array[Long](m)
    var g = 0
    while (g < m) {
      val from = starts(g)
      val lastTok = math.min(g + n - 1, nt - 1)
      val until = starts(lastTok + 1) - 1
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      // first 15 hex nibbles = bytes 0..6 (56 bits) + high nibble of byte 7
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      h(g) = (v << 4) | ((d(7) & 0xf0L) >> 4)
      g += 1
    }
    java.util.Arrays.sort(h)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || h(r) != h(r - 1)) { h(w) = h(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) h else java.util.Arrays.copyOf(h, w))
  }
}
