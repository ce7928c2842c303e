package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** `SparkSessionExtensions` installer for graft's native expressions, so
  * they are callable from SQL text as well as the DataFrame API:
  *
  *   SparkSession.builder().withExtensions(GraftExtensions.install)  // code
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions    // config
  *
  * Registered functions:
  *  - `float_dot(array<float>, array<float>) -> double` — codegen'd
  *    sequential-fold dot product ([[FloatDot]]).
  *  - `md5_slices(string, groups int literal) -> array<bigint>` — the
  *    MinHash hash family ([[Md5Slices]]).
  *  - `simhash_bits(string) -> bigint` — per-token 48-bit SimHash vote
  *    mask ([[SimhashBits]]).
  *  - `simhash_fp(string, bits int literal) -> bigint` — whole-document
  *    SimHash fingerprint ([[SimhashFp]]).
  *  - `minhash_sigs(string, groups int literal, shingleLen int literal)
  *    -> array<bigint>` — whole-document MinHash signature
  *    ([[MinhashSigs]]).
  *  - `hashed_linear_sum(string, salt string literal) -> array<bigint>`
  *    — `[Σ hashed-weight slices, token count]` accumulator of the
  *    hashing-trick linear scorer ([[HashedLinearSum]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {

  val install: SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_dot(a, b) takes two array<float> arguments")
        FloatDot(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_slices"),
      new ExpressionInfo(classOf[Md5Slices].getName, "md5_slices"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "md5_slices(s, groups) takes two arguments")
        val groups = args(1) match {
          case Literal(g: Int, IntegerType) => g
          case other => throw new IllegalArgumentException(
            s"md5_slices groups must be an int literal, got $other")
        }
        Md5Slices(args.head, groups)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimhashBits].getName, "simhash_bits"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_bits(s) takes one string argument")
        SimhashBits(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFp].getName, "simhash_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_fp(s, bits) takes two arguments")
        SimhashFp(args.head, intLit(args(1), "simhash_fp bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "minhash_sigs(s, groups, shingleLen) takes three arguments")
        MinhashSigs(args.head, intLit(args(1), "minhash_sigs groups"),
          intLit(args(2), "minhash_sigs shingleLen"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hashed_linear_sum"),
      new ExpressionInfo(classOf[HashedLinearSum].getName, "hashed_linear_sum"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "hashed_linear_sum(s, salt) takes two arguments")
        val salt = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"hashed_linear_sum salt must be a string literal, got $other")
        }
        HashedLinearSum(args.head, salt)
      }))
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
}
