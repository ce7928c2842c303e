package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The DISTINCT xxhash64 word-`n`-gram hashes of a canonical document in
  * ONE fused pass — the stream every n-gram set operator exchanges
  * (`ngramJaccardPairs`, the containment/prefix family, the
  * decontamination scans). Byte-identical to
  * `xxhash64(explode(array_distinct(wordNgrams(tokens(text)))))`: gram
  * bytes are SUBSTRINGS of the single-space canonical form (the
  * [[WinnowPicks]]/[[CmsPairs]] device) hashed with Spark's xxhash64 seed
  * (42), so no per-gram string is ever allocated and the within-doc
  * dedup is a primitive sort instead of an `array_distinct` over
  * freshly-built strings. Output order is ascending (sorted by the
  * dedup), which no consumer observes — every caller explodes into a
  * keyed exchange.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "need n > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashes.hashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {

  /** Spark's xxhash64 seed for the one-argument form. */
  private val Seed = 42L

  /** Sorted distinct xxhash64 hashes of `s`'s word-n-gram set. */
  def hashes(s: UTF8String, n: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    // token start offsets (split on single spaces; "" → one empty token)
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
    starts(nt) = bytes.length + 1 // sentinel: token j ends at starts(j+1)-2
    val m = math.max(nt - n + 1, 1)
    val h = new Array[Long](m)
    var g = 0
    while (g < m) {
      val from = starts(g)
      val lastTok = math.min(g + n - 1, nt - 1)
      val until = starts(lastTok + 1) - 1 // exclusive end (before space)
      h(g) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + from, until - from, Seed)
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
