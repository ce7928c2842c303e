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
  *
  * `boundary` (optional, the word-boundary sentinel token the caller's
  * tokenization inserted — [[graft.ext.TextAnalysis.BpeBoundary]])
  * enables the PER-WORD FACTORIZATION + CACHE every production BPE
  * applier uses: merge tokens are validated boundary-free, so no pair
  * ever matches across or at a boundary token and the greedy pass
  * factorizes EXACTLY into independent per-word passes (spec-proved
  * against the unsegmented pass). Each word's merged form is then
  * memoized in a thread-local table-keyed cache — natural text is
  * Zipfian, so the O(merges × tokens) loop runs once per DISTINCT word
  * per task instead of once per occurrence (the HuggingFace-tokenizers
  * word-cache shape). Empty boundary = no segmentation, the plain pass.
  */
case class BpeMerge(child: Expression, merges: Seq[(String, String)],
    boundary: String = "")
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
    BpeMerge.merge(input.asInstanceOf[UTF8String], lefts, rights, cats,
      boundary)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("lefts", lefts, "java.lang.String[]")
    val r = ctx.addReferenceObj("rights", rights, "java.lang.String[]")
    val c = ctx.addReferenceObj("cats", cats, "java.lang.String[]")
    val b = ctx.addReferenceObj("boundary", boundary, "java.lang.String")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.BpeMerge.merge($in, $l, $r, $c, $b);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

object BpeMerge {

  /** Thread-local word→merged cache, keyed to ONE merge table at a time:
    * a task thread applies a single table, so on a table switch (the
    * `lefts` array identity changes — reference objects are per-plan
    * singletons within an executor) the map is cleared rather than
    * cross-keyed. Bounded: cleared wholesale past `CacheCap` entries
    * (amortized O(1), no LRU bookkeeping on the hot path).
    */
  private final val CacheCap = 1 << 16
  private final class WordCache {
    var table: AnyRef = null
    val map = new java.util.HashMap[String, String](1 << 12)
  }
  private val caches: ThreadLocal[WordCache] =
    ThreadLocal.withInitial(() => new WordCache)

  def merge(s: UTF8String, lefts: Array[String], rights: Array[String],
      cats: Array[String], boundary: String): UTF8String = {
    val raw = s.toString.split(" ")
    val toks = new Array[String](raw.length)
    var n = 0
    var j = 0
    while (j < raw.length) {
      if (raw(j).nonEmpty) { toks(n) = raw(j); n += 1 }
      j += 1
    }
    val sb = new java.lang.StringBuilder(s.numChars() + 2)
    sb.append(' ')
    if (boundary == null || boundary.isEmpty) {
      // unsegmented: one pass over the whole stream (generic inputs —
      // property fixtures, callers without a boundary convention)
      val m = mergeRun(toks, 0, n, lefts, rights, cats)
      sb.append(m)
      if (m.nonEmpty) sb.append(' ')
    } else {
      val cache = caches.get()
      if (cache.table ne lefts) {
        cache.map.clear(); cache.table = lefts
      }
      var i = 0
      while (i < n) {
        if (toks(i) == boundary) {
          sb.append(boundary); sb.append(' '); i += 1
        } else {
          var e = i
          var keyLen = -1
          while (e < n && toks(e) != boundary) {
            keyLen += toks(e).length + 1; e += 1
          }
          val kb = new java.lang.StringBuilder(keyLen)
          var k = i
          while (k < e) {
            if (k > i) kb.append(' ')
            kb.append(toks(k)); k += 1
          }
          val key = kb.toString
          var merged = cache.map.get(key)
          if (merged == null) {
            merged = mergeRun(toks, i, e - i, lefts, rights, cats)
            if (cache.map.size >= CacheCap) cache.map.clear()
            cache.map.put(key, merged)
          }
          sb.append(merged); sb.append(' ')
          i = e
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Replay every merge in array order over `toks[start, start+len)`;
    * per merge, one leftmost-greedy in-place pass (merge at i → resume
    * at i+2). Returns the merged run as single-space-joined tokens.
    * Copies the slice so the caller's array survives for later runs.
    */
  private def mergeRun(src: Array[String], start: Int, len: Int,
      lefts: Array[String], rights: Array[String],
      cats: Array[String]): String = {
    if (len == 0) return ""
    val toks = new Array[String](len)
    System.arraycopy(src, start, toks, 0, len)
    var n = len
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
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(toks(k)); k += 1
    }
    sb.toString
  }
}
