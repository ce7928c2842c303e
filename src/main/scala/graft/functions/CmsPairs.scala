package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Count-Min (row, bucket) pair stream of a document in ONE fused
  * pass: every word-`n`-gram of the canonical text contributes `depth`
  * packed `row << 32 | bucket` longs, where the buckets are the
  * [[Md5Slices]] hash family (`uint32` slice `r mod 4` of
  * `md5("⌊r/4⌋|" + gram)`) taken mod `width`.
  *
  * Replaces the `tokens → wordNgrams transform → explode → Md5Slices →
  * explode(struct array)` Column chain: gram bytes are SUBSTRINGS of the
  * canonical input (tokens are single-space separated, so the n-token
  * join equals the byte slice; a tail shorter than `n` yields one
  * partial gram — `wordNgrams` semantics, the [[WinnowPicks]] device),
  * so the pass allocates no per-gram strings and digests each gram's
  * group exactly once into a primitive long array.
  */
case class CmsPairs(child: Expression, n: Int, depth: Int, width: Int)
    extends UnaryExpression {

  require(n > 0 && depth > 0 && width > 0, "need n, depth, width > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_pairs requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cms_pairs"

  override protected def nullSafeEval(input: Any): Any =
    CmsPairs.pairs(input.asInstanceOf[UTF8String], n, depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CmsPairs.pairs($c, $n, $depth, $width);")

  override protected def withNewChildInternal(newChild: Expression): CmsPairs =
    copy(child = newChild)
}

object CmsPairs {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Packed `(row << 32 | bucket)` CMS increments of `s`'s n-gram
    * stream: `grams × depth` longs, gram-major, row-minor.
    */
  def pairs(s: UTF8String, n: Int, depth: Int, width: Int): UnsafeArrayData = {
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
    val groups = (depth + 3) / 4
    val prefixes = Array.tabulate(groups)(g =>
      (g.toString + "|").getBytes(StandardCharsets.UTF_8))
    val md = digests.get()
    val out = new Array[Long](m * depth)
    var g = 0
    while (g < m) {
      val from = starts(g)
      val lastTok = math.min(g + n - 1, nt - 1)
      val until = starts(lastTok + 1) - 1 // exclusive end (before space)
      var grp = 0
      while (grp < groups) {
        md.reset()
        md.update(prefixes(grp))
        md.update(bytes, from, until - from)
        val d = md.digest()
        var j = 0
        while (j < 4 && grp * 4 + j < depth) {
          val r = grp * 4 + j
          val slice = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
          out(g * depth + r) = (r.toLong << 32) | (slice % width)
          j += 1
        }
        grp += 1
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
