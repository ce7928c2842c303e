package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. 2003) in ONE fused
  * pass: token `k`-gram hashes (the [[Md5Slices]] uint32, `md5("0|" +
  * gram)`) winnowed with a `w`-hash window and the rightmost-min rule,
  * each selected (1-based gram position, hash) packed as
  * `pos << 32 | hash` into the returned long array.
  *
  * Replaces the `transform(sequence(...), slice/array_min/reverse/
  * array_position)` higher-order chain, which Catalyst evaluates with
  * per-window interpreted lambdas and which re-materializes each window
  * slice. Here the gram hashes are computed once into a primitive array —
  * gram bytes are SUBSTRINGS of the canonical input (tokens are
  * single-space separated, so the k-token join equals the byte slice;
  * a tail shorter than `k` yields one partial gram, `wordNgrams`
  * semantics) — and the windows scan that array directly.
  *
  * A selected position's windows are contiguous (rightmost-min ties make
  * re-selection of an older position impossible once a newer equal hash
  * enters), so dedup against the LAST emitted pick reproduces the
  * distinct-set semantics exactly.
  */
case class WinnowPicks(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "need k, w > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_picks requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_picks"

  override protected def nullSafeEval(input: Any): Any =
    WinnowPicks.picks(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowPicks.picks($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowPicks =
    copy(child = newChild)
}

object WinnowPicks {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Prefix = "0|".getBytes(StandardCharsets.UTF_8)

  /** Packed `(pos << 32 | uint32 hash)` winnowing picks of `s`. */
  def picks(s: UTF8String, k: Int, w: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    // token start offsets (split on single spaces; "" → one empty token)
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(n) = bytes.length + 1   // sentinel: token j spans
    // [starts(j), starts(j+1) - 2] inclusive
    val m = math.max(n - k + 1, 1)
    val md = digests.get()
    val h = new Array[Long](m)
    var g = 0
    while (g < m) {
      val from = starts(g)
      val lastTok = math.min(g + k - 1, n - 1)
      val until = starts(lastTok + 1) - 1   // exclusive end (before space)
      md.reset()
      md.update(Prefix)
      md.update(bytes, from, until - from)
      val d = md.digest()
      h(g) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      g += 1
    }
    val nw = math.max(m - w + 1, 1)
    val out = new Array[Long](nw)
    var cnt = 0
    var lastPos = -1
    var j = 0
    while (j < nw) {
      val end = math.min(j + w - 1, m - 1)
      var best = end
      var p = end - 1
      while (p >= j) { if (h(p) < h(best)) best = p; p -= 1 }
      if (best != lastPos) {
        out(cnt) = ((best + 1).toLong << 32) | h(best)
        cnt += 1
        lastPos = best
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }
}
