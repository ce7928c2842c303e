package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole quality-signal bundle of
  * [[graft.ext.TextAnalysis]] — normalized char count, token count, punct
  * ratio, stopword ratio, mean token length — fused into ONE codegen'd pass
  * over the raw text.
  *
  * The composed-column formulation pays for the same work several times:
  * `stopwordHits` (an array `filter`) and `avgTokenLenOfToks` (an array
  * `aggregate`) are higher-order functions that evaluate interpreted,
  * outside whole-stage codegen and its subexpression elimination, and the
  * token array itself has to be materialized per row. Here nothing is
  * materialized: one streaming scan over the lowercased text tokenizes,
  * counts and classifies in place, so per-row cost is strictly
  * bytes-proportional and the operator stays inside whole-stage codegen at
  * any scale.
  *
  * Field semantics are bit-identical to the composed columns (the spec
  * asserts equality row-by-row):
  *
  *  - `n_chars_norm` = `length(normalize(text))` — codepoints of the
  *    lowercased, whitespace-collapsed, trimmed form;
  *  - `n_tokens` = `size(split(norm, " "))` — note an empty norm yields ONE
  *    empty token, matching Spark's `split`;
  *  - `punct_ratio` = share of norm codepoints outside `[a-z0-9 ]`
  *    (0.0 for an empty norm);
  *  - `stopword_ratio` = tokens ∈ `stopwords` / `n_tokens`;
  *  - `avg_token_len` = Σ token codepoints / `n_tokens`.
  *
  * Whitespace is Java-regex `\s` ([ \t\n\x0B\f\r]) to replicate
  * `regexp_replace(text, "\\s+", " ")`, and lowercasing delegates to
  * `UTF8String.toLowerCase` — the exact kernel Spark's `lower` uses — so
  * locale/Unicode edge cases cannot diverge from the composed form.
  */
case class QualityScores(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_scores requires a string input, got ${child.dataType}")

  override def dataType: DataType = QualityScores.schema

  override def prettyName: String = "quality_scores"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    QualityScores.score(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityScores.score($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScores =
    copy(child = newChild)
}

object QualityScores {

  val schema: StructType = StructType(Seq(
    StructField("n_chars_norm", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false)))

  // Java-regex \s, the whitespace class of TextAnalysis.normalize
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  /** One streaming pass: tokenize the lowercased text on whitespace runs
    * (≡ collapse-then-split) and accumulate every signal.
    */
  def score(s: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    val str = s.toLowerCase.toString
    val n = str.length
    var i = 0
    var nTok = 0      // completed tokens
    var sumLen = 0    // Σ token codepoints (= norm chars minus separators)
    var punct = 0     // token codepoints outside [a-z0-9]
    var hits = 0      // tokens in the stopword set
    var tokStart = -1 // char offset of the current token, -1 = between tokens
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isWs(cp)) {
        if (tokStart >= 0) {
          nTok += 1
          if (stop.contains(str.substring(tokStart, i))) hits += 1
          tokStart = -1
        }
      } else {
        if (tokStart < 0) tokStart = i
        sumLen += 1
        if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9'))) punct += 1
      }
      i += Character.charCount(cp)
    }
    if (tokStart >= 0) {
      nTok += 1
      if (stop.contains(str.substring(tokStart, n))) hits += 1
    }
    // all-whitespace/empty input: norm = "" and split("", " ") = [""] — one
    // empty token, zero chars
    if (nTok == 0) nTok = 1
    val chars = if (sumLen == 0) 0 else sumLen + (nTok - 1)
    new GenericInternalRow(Array[Any](
      chars, nTok,
      if (chars == 0) 0.0 else punct.toDouble / chars,
      hits.toDouble / nTok,
      sumLen.toDouble / nTok))
  }
}
