package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The MinHash hash family used by `graft.ext.Dedup`: `4 × groups`
  * independent 32-bit hash values per input string, taken as the big-endian
  * unsigned int slices of `groups` md5 digests keyed `"<g>|<input>"`.
  *
  * Equivalent SQL (the DuckDB oracle form) per value `j`:
  * `CAST(concat('0x', substr(md5(concat(j/4, '|', s)), 1 + 8*(j%4), 8)) AS BIGINT)`
  *
  * Doing this in one codegen'd expression instead of the equivalent
  * `conv(substring(md5(...)))` chain matters in the shingle hot loop: the
  * digest bytes are sliced directly — no hex encode, no substring, no
  * string-to-long parse — and the min-aggregate downstream runs over longs,
  * which HashAggregate handles (a string min would fall back to
  * SortAggregate and sort the whole exploded shingle stream twice).
  */
case class Md5Slices(child: Expression, groups: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_slices requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "md5_slices"

  override protected def nullSafeEval(input: Any): Any =
    Md5Slices.slices(input.asInstanceOf[UTF8String], groups)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Slices.slices($c, $groups);")

  override protected def withNewChildInternal(newChild: Expression): Md5Slices =
    copy(child = newChild)
}

object Md5Slices {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `4*groups` unsigned-int slices of md5("<g>|" + s) for g < groups. */
  def slices(s: UTF8String, groups: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    val out = new Array[Long](groups * 4)
    val md = digests.get()
    var g = 0
    while (g < groups) {
      md.reset()
      md.update((g.toString + "|").getBytes(StandardCharsets.UTF_8))
      md.update(bytes)
      val d = md.digest()
      var i = 0
      while (i < 4) {
        out(g * 4 + i) =
          ((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
          ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)
        i += 1
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
