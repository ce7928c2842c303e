package graft.util

import org.apache.spark.sql.DataFrame

/** Cache lifecycle for operators whose plan reuses an expensive subtree
  * (exploded shingles, ANN cell assignments) on several branches.
  */
object Caching {

  /** Materialize `result` into its own (compact) cache, then release the
    * large intermediate caches it derives from. Without this, each operator
    * invocation leaks its intermediate cache for the life of the session —
    * library callers don't `clearCache()` between calls. The result stays a
    * normal lazy DataFrame backed by a small cached row set; on block loss
    * it recomputes from lineage (the unpersisted intermediates just
    * recompute too), so this is cluster-safe where a `localCheckpoint`
    * would not be.
    */
  def materializeAndRelease(result: DataFrame,
      intermediates: DataFrame*): DataFrame = {
    val out = result.persist()
    try out.count()
    finally intermediates.foreach(_.unpersist(blocking = false))
    out
  }
}
