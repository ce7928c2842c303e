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

  /** Running minima of the [[Md5Slices]] hash family over all shingles. */
  def sigs(s: UTF8String, groups: Int, shingleLen: Int): UnsafeArrayData = {
    val positions = math.max(s.numChars() - (shingleLen - 1), 1)
    val out = Array.fill(groups * 4)(Long.MaxValue)
    val md = digests.get()
    val pfx = prefixes(groups)
    var p = 1
    while (p <= positions) {
      val bytes = s.substringSQL(p, shingleLen).getBytes
      var g = 0
      while (g < groups) {
        md.reset()
        md.update(pfx(g))
        md.update(bytes)
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
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
