package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature in ONE pass: the `4 × groups` running
  * minima of [[Md5Slices]] values over every `shingleLen`-char shingle of
  * the (already canonicalized) input — exactly
  * `min(md5_slices(shingle)[j])` over the shingle multiset, fused so no
  * per-shingle row ever exists.
  *
  * This removes the dominant cost of the MinHash pipeline shape: the
  * exploded (doc, shingle) frame (≈ len(text) rows per document) that had
  * to be shuffled into a 2×k-column HashAggregate and persisted for reuse.
  * Here signatures are a map-only projection — embarrassingly parallel,
  * no shuffle, no cache — and the shingle explode is reserved for the few
  * candidate documents that need exact-Jaccard verification.
  *
  * Shingle positions replicate `shingleArray`
  * (`graft.ext.Dedup.shingleArray`): 1-based `substr(i, n)` for
  * `i ≤ max(len - n + 1, 1)` — a short text yields its single whole-text
  * shingle. Hash family identical to [[Md5Slices]] (`md5("<g>|" + s)` big-
  * endian 32-bit slices), so the DuckDB oracle formula is unchanged.
  */
case class MinhashSigs(child: Expression, groups: Int, shingleLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigs.sigs(input.asInstanceOf[UTF8String], groups, shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSigs.sigs($c, $groups, $shingleLen);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // the "<g>|" digest-key prefixes depend only on `groups`, which is fixed
  // per expression — cached so the per-document hot path allocates nothing
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixes(groups: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(groups, g =>
      Array.tabulate(g)(i => (i.toString + "|").getBytes(StandardCharsets.UTF_8)))

  /** Running minima of the [[Md5Slices]] hash family over all shingles.
    *
    * The text's UTF-8 bytes are materialized ONCE and each shingle is
    * hashed as a byte SLICE between char boundaries (`md.update(bytes,
    * start, len)`) — the same fused-substring device as [[GramHashes]] /
    * [[CmsPairs]]. A char-shingle's UTF-8 encoding IS the byte run between
    * its start/end char offsets, so digests are bit-identical to the
    * earlier per-position `substringSQL(p, n).getBytes` form (which paid a
    * UTF8String + byte-array allocation per shingle position — ≈ len(text)
    * copies per document on the x3/x41/x97/x102 hot path). Two byte
    * cursors slide one char per position; non-ASCII advances by the
    * UTF-8 sequence length, ASCII by 1.
    */
  def sigs(s: UTF8String, groups: Int, shingleLen: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    val positions = math.max(nChars - (shingleLen - 1), 1)
    val out = Array.fill(groups * 4)(Long.MaxValue)
    val md = digests.get()
    val pfx = prefixes(groups)
    // [startB, endB) = byte run of the current shingle's chars; a short
    // text (nChars < shingleLen) yields its single whole-text shingle
    var startB = 0
    var endB = 0
    var warm = math.min(shingleLen, nChars)
    while (warm > 0) {
      endB += UTF8String.numBytesForFirstByte(bytes(endB))
      warm -= 1
    }
    var p = 1
    while (p <= positions) {
      var g = 0
      while (g < groups) {
        md.reset()
        md.update(pfx(g))
        md.update(bytes, startB, endB - startB)
        val d = md.digest()
        var i = 0
        while (i < 4) {
          val v = ((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
            ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)
          if (v < out(g * 4 + i)) out(g * 4 + i) = v
          i += 1
        }
        g += 1
      }
      if (p < positions) {
        startB += UTF8String.numBytesForFirstByte(bytes(startB))
        if (endB < bytes.length)
          endB += UTF8String.numBytesForFirstByte(bytes(endB))
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
