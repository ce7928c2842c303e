package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE merge application over a space-delimited token string — the
  * APPLY step of byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016,
  * §3.2: merges learned at train time are replayed in rank order over new
  * text). The input is the canonical token form `" t1 t2 … tn "` (every
  * token enclosed by single spaces); each trained merge `(l, r)`, taken in
  * rank order, runs ONE leftmost-greedy pass over the token sequence:
  * scanning left to right, every adjacent `(l, r)` pair becomes the single
  * token `lr` and the scan resumes AFTER the merged token (so
  * `" a a a "` + (a,a) → `" aa a "` and `" a a a a "` → `" aa aa "`).
  * One pass per rank is complete: a merge's output token `lr` can never
  * recreate its own pair (that would need `lr == l` or `lr == r`,
  * impossible for non-empty `l`, `r`), so no occurrence survives the pass.
  *
  * NOT plain string replace: `replace(" l r ", " lr ")` under-merges runs
  * because consecutive pair occurrences share their delimiter space and
  * the non-overlapping scan skips the second of each adjacent pair
  * (`" a a a a " → " aa a a "`). The DuckDB oracle therefore mirrors the
  * greedy pass with the DOUBLED-DELIMITER replace chain: double every
  * space, replace `" l  r " → " lr "`, halve the spaces at the end. With
  * two-space delimiters each pair occurrence consumes only the inner
  * space of its outer delimiters, so adjacent occurrences are disjoint in
  * string space and replace-all's non-overlapping left-to-right scan
  * selects exactly the greedy pairing (and tokens are space-free, so
  * every `" X  Y "` match is token-boundary aligned).
  *
  * One fused expression instead of a `maxMerges`-deep nested column tree
  * (the [[HashedLinearSum]] lesson: a trained merge table is 30-50k rows —
  * folding it into the plan would blow past the codegen method limit and
  * serialize a 50k-node tree per task). The merge list rides the
  * expression as reference objects; per-row work is O(merges × tokens)
  * (token equality checks fail fast on length), and the whole pass stays
  * inside whole-stage codegen.
  */
case class BpeMerge(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_merge requires a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_merge"

  @transient private lazy val lefts: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rights: Array[String] = merges.map(_._2).toArray
  @transient private lazy val cats: Array[String] =
    merges.map { case (l, r) => l + r }.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeMerge.merge(input.asInstanceOf[UTF8String], lefts, rights, cats)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("lefts", lefts, "java.lang.String[]")
    val r = ctx.addReferenceObj("rights", rights, "java.lang.String[]")
    val c = ctx.addReferenceObj("cats", cats, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.BpeMerge.merge($in, $l, $r, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

object BpeMerge {

  /** Replay every merge in array order; per merge, one leftmost-greedy
    * in-place pass over the token array (merge at i → resume at i+2).
    * Tokenization splits on the canonical single-space delimiters and
    * drops empties, so leading/trailing delimiter spaces are harmless.
    * Output restores the canonical `" t1 t2 … tn "` form.
    */
  def merge(s: UTF8String, lefts: Array[String], rights: Array[String],
      cats: Array[String]): UTF8String = {
    val raw = s.toString.split(" ")
    val toks = new Array[String](raw.length)
    var n = 0
    var j = 0
    while (j < raw.length) {
      if (raw(j).nonEmpty) { toks(n) = raw(j); n += 1 }
      j += 1
    }
    var m = 0
    while (m < lefts.length && n > 1) {
      val l = lefts(m)
      val r = rights(m)
      var i = 0
      var w = 0
      while (i < n) {
        if (i + 1 < n && toks(i) == l && toks(i + 1) == r) {
          toks(w) = cats(m); i += 2
        } else {
          toks(w) = toks(i); i += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    val sb = new java.lang.StringBuilder(s.numChars() + 2)
    sb.append(' ')
    var k = 0
    while (k < n) { sb.append(toks(k)); sb.append(' '); k += 1 }
    UTF8String.fromString(sb.toString)
  }
}
