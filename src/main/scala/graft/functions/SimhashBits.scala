package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-token SimHash bit vector used by `graft.ext.Dedup.simhash`: a
  * 48-bit mask whose bit `48 - i` (1-based nibble index `i`) is the top bit
  * of hex nibble `i` of `md5(t) ++ md5("1|" + t)` — exactly the hash family
  * of the DuckDB oracle form
  * `substr(md5(t) || md5('1|' || t), i, 1) IN ('8'..'f')`.
  *
  * One codegen'd digest pass replaces 48 separate
  * `substring(h, i, 1).isin(...)` chains per token occurrence: the digest
  * bytes are tested directly (no hex string is ever materialized) and the
  * downstream vote aggregation becomes 48 long bit-ops
  * (`(mask >> s) & 1`), which HashAggregate sums without touching strings.
  */
case class SimhashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_bits requires a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    SimhashBits.mask(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashBits.mask($c);")

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val prefix = "1|".getBytes(StandardCharsets.UTF_8)

  /** 48-bit mask: bit (47 - i) = top bit of 0-based nibble i of
    * md5(t) ++ md5("1|" + t) (nibbles 0..31 from the first digest,
    * 32..47 from the second).
    */
  def mask(s: UTF8String): Long = {
    val bytes = s.getBytes
    mask(bytes, 0, bytes.length)
  }

  /** Same mask over a UTF-8 byte slice — lets callers that already hold
    * the document bytes (e.g. [[SimhashFp]]'s in-place tokenizer) hash
    * tokens without materializing per-token strings.
    */
  def mask(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d0 = md.digest()
    md.reset()
    md.update(prefix)
    md.update(bytes, off, len)
    val d1 = md.digest()
    var m = 0L
    var i = 0
    while (i < 48) {
      val d = if (i < 32) d0 else d1
      val j = if (i < 32) i else i - 32
      val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
      if ((nib & 8) != 0) m |= 1L << (47 - i)
      i += 1
    }
    m
  }
}
