package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DSIR importance-mass accumulator in ONE fused pass:
  * `[n_tokens, Σ (target[bucket(t)]+1), Σ (raw[bucket(t)]+1)]` over the
  * space-separated tokens of the (already canonicalized) input, where
  * `bucket(t)` is the big-endian unsigned 32-bit head of
  * `md5("<salt>|" + t)` mod the table length — exactly
  * [[graft.ext.Corpus.importanceAffinityAgainst]]'s arithmetic with the
  * add-one smoothing folded in.
  *
  * Replaces the `aggregate(transform(split(...)))` + `element_at(map)`
  * higher-order chain, which Catalyst evaluates with per-element
  * interpreted lambdas OUTSIDE whole-stage codegen and which materializes
  * the token and bucket arrays. Here both masses accumulate in a single
  * straight-line loop over the UTF8String with two array loads per token —
  * the [[HashedLinearSum]] shape with a bounded-table lookup.
  *
  * The count tables ride the expression as plain long arrays (length =
  * bucket count, missing buckets zero): bounded by construction — the same
  * driver-bounded contract as the collected literal maps they replace.
  * Token boundaries replicate `split(normalized, " ")`; the empty input
  * yields ONE empty token.
  */
case class HashedBucketMasses(child: Expression, salt: String,
    target: Array[Long], raw: Array[Long]) extends UnaryExpression {

  require(target.length == raw.length && target.length > 0,
    "target and raw tables must share a positive length")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_bucket_masses requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hashed_bucket_masses"

  override protected def nullSafeEval(input: Any): Any =
    HashedBucketMasses.masses(input.asInstanceOf[UTF8String], salt,
      target, raw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    val tRef = ctx.addReferenceObj("target", target, "long[]")
    val rRef = ctx.addReferenceObj("raw", raw, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedBucketMasses.masses($c, $saltRef, $tRef, $rRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBucketMasses =
    copy(child = newChild)
}

object HashedBucketMasses {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def prefix(salt: String): Array[Byte] =
    prefixCache.computeIfAbsent(salt, s =>
      (s + "|").getBytes(StandardCharsets.UTF_8))

  /** `[n, Σ(target[b]+1), Σ(raw[b]+1)]` over space-separated tokens. */
  def masses(s: UTF8String, salt: String, target: Array[Long],
      raw: Array[Long]): UnsafeArrayData = {
    val bytes = s.getBytes
    val pfx = prefix(salt)
    val md = digests.get()
    val buckets = target.length
    var n = 0L
    var tm = 0L
    var rm = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(pfx)
        md.update(bytes, start, i - start)
        val d = md.digest()
        val slice = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val b = (slice % buckets).toInt
        n += 1
        tm += target(b) + 1
        rm += raw(b) + 1
        start = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(n, tm, rm))
  }
}
