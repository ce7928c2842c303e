package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftshim.shim

/** Cache lifecycle for operators whose plan reuses an expensive subtree
  * (exploded shingles, ANN cell assignments, range-partitioned rank
  * frames) on several branches. Two disciplines:
  *
  *  - [[materializeAndRelease]] (EAGER): right when the operator's result
  *    is a compact reduction (quantile rows, threshold tables, heavy-hitter
  *    verdicts) — the forced pass is one tiny job and the corpus-sized
  *    intermediates are gone before the operator returns.
  *  - [[releaseWhenUsed]] (DEFERRED): right when the operator's result is
  *    corpus-sized and usually consumed once by the caller's own terminal
  *    action (shard layouts, packed corpora). Forcing a pass there splits
  *    the caller's query in two, re-executing every upstream subtree the
  *    two halves share and paying a result-cache write + read-back that
  *    the terminal action never needed (round-12 adjudication: +1.0 s on
  *    x62's three-stage layout chain). Instead the intermediates are
  *    registered and released at the NEXT registration/eager call after
  *    their buffers have actually materialized — i.e. after the caller's
  *    action has run through them.
  *
  * Net guarantee: cached intermediates never accumulate across operator
  * invocations; at most one invocation's transient caches are outstanding
  * at a time (the last one's, until the next graft cache-managed operator
  * runs or the session clears its caches).
  */
object Caching {

  private val pending = new ConcurrentLinkedQueue[DataFrame]()

  /** Materialize `result` into its own (compact) cache, then release the
    * large intermediate caches it derives from. The result stays a normal
    * lazy DataFrame backed by a small cached row set; on block loss it
    * recomputes from lineage (the unpersisted intermediates just recompute
    * too), so this is cluster-safe where a `localCheckpoint` would not be.
    */
  def materializeAndRelease(result: DataFrame,
      intermediates: DataFrame*): DataFrame = {
    drain()
    val out = result.persist()
    try out.count()
    finally intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  /** Register operator-local caches for DEFERRED release: each is
    * unpersisted at a later [[drain]] once its buffers have materialized
    * (the consumer's action has run through it) or it is no longer
    * registered (someone unpersisted/cleared it). No eager job runs here —
    * the caller's own terminal action stays one fused query with full
    * exchange/cache reuse.
    */
  def releaseWhenUsed(frames: DataFrame*): Unit = {
    drain()
    frames.foreach(pending.add)
  }

  /** Release every pending registration that has served its purpose; keep
    * the ones whose cache is registered but not yet materialized (their
    * consumer has not run an action yet). Runs at every cache-managed
    * operator entry, so outstanding transient caches are bounded by one
    * invocation's worth.
    */
  def drain(): Unit = {
    val it = pending.iterator()
    while (it.hasNext) {
      val df = it.next()
      val keep =
        try shim.isCacheRegistered(df) && !shim.isCacheMaterialized(df)
        catch { case _: Throwable => false }
      if (!keep) {
        it.remove()
        df.unpersist(blocking = false)
      }
    }
  }
}
