package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim

/** Deferred cache release ([[Caching.releaseWhenUsed]]/[[Caching.drain]]):
  * an intermediate registered for deferred release must SURVIVE drains
  * until its consumer has actually materialized it, then be released by
  * the next drain — and unregistered/cleared frames must never pin the
  * registry.
  */
class CachingSpec extends SparkSpec {

  import spark.implicits._

  test("releaseWhenUsed: survives drain until materialized, then releases") {
    spark.catalog.clearCache()
    Caching.drain() // flush registrations from other suites in this JVM
    val inter = Seq(1, 2, 3).toDF("v").persist()
    Caching.releaseWhenUsed(inter)
    // not yet materialized: a drain must keep it registered
    Caching.drain()
    assert(shim.isCacheRegistered(inter),
      "unmaterialized intermediate must survive drain")
    // consumer action materializes the cache
    assert(inter.agg(sum(col("v"))).head().getLong(0) === 6L)
    assert(shim.isCacheMaterialized(inter))
    // the next drain (every cache-managed operator entry calls it) releases
    Caching.drain()
    assert(!shim.isCacheRegistered(inter),
      "materialized intermediate must be released by the next drain")
  }

  test("releaseWhenUsed: externally-cleared frames drop out of the registry") {
    spark.catalog.clearCache()
    Caching.drain()
    val inter = Seq(1).toDF("v").persist()
    Caching.releaseWhenUsed(inter)
    spark.catalog.clearCache() // e.g. the Verify harness between queries
    Caching.drain() // must not throw, must drop the stale registration
    assert(!shim.isCacheRegistered(inter))
  }

  test("materializeAndRelease: result cached eagerly, intermediates gone") {
    spark.catalog.clearCache()
    Caching.drain()
    val inter = Seq(1, 2).toDF("v").persist()
    val out = Caching.materializeAndRelease(
      inter.agg(sum(col("v")).as("s")), inter)
    assert(shim.isCacheMaterialized(out), "result must be materialized")
    assert(!shim.isCacheRegistered(inter), "intermediate must be released")
    out.unpersist()
  }
}
