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
  * rank order, rewrites ALL non-overlapping left-to-right occurrences of
  * `" l r "` into `" lr "` — literal string replacement, which is exactly
  * the DuckDB `replace` chain the oracle mirrors, so results are
  * engine-identical by construction. Consecutive overlapping pairs share
  * their delimiting space, so replace-all yields the leftmost-greedy
  * pairing BPE specifies (`" a a a "` + (a,a) → `" aa a "`).
  *
  * One fused expression instead of a `maxMerges`-deep nested `replace`
  * column tree (the [[HashedLinearSum]] lesson: a trained merge table is
  * 30-50k rows — folding it into the plan would blow past the codegen
  * method limit and serialize a 50k-node tree per task). The merge list
  * rides the expression as one reference object; per-row work is
  * O(merges × len) with an `indexOf` fast-reject per absent merge, and
  * the whole pass stays inside whole-stage codegen.
  */
case class BpeMerge(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_merge requires a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_merge"

  @transient private lazy val pats: Array[String] =
    merges.map { case (l, r) => s" $l $r " }.toArray
  @transient private lazy val reps: Array[String] =
    merges.map { case (l, r) => s" $l$r " }.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeMerge.merge(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("pats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("reps", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeMerge.merge($c, $patsRef, $repsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

object BpeMerge {

  /** Apply every `" l r " → " lr "` rewrite in array order; literal
    * non-overlapping left-to-right replacement per merge (Java
    * `String.replace` ≡ DuckDB `replace` — both match in the INPUT only,
    * never rescanning replacement text, so a merge can not cascade within
    * its own pass).
    */
  def merge(s: UTF8String, pats: Array[String], reps: Array[String]): UTF8String = {
    var str = s.toString
    var i = 0
    while (i < pats.length) {
      val p = pats(i)
      if (str.contains(p)) str = str.replace(p, reps(i))
      i += 1
    }
    UTF8String.fromString(str)
  }
}
