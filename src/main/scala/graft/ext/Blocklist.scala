package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim

/** Blocklist filtering: remove corpus rows whose key appears in a removal
  * list (takedown requests, opted-out domains, known-bad document ids) —
  * the reference's anti-join dedup pattern (`properties_data_load.py`
  * delete-before-insert semantics) generalized to a list that is too large
  * to broadcast.
  *
  * Scale design. A plain `left_anti` join against a non-broadcastable
  * blocklist shuffles the ENTIRE corpus on the key — at 100 TB that
  * exchange is the job. Here the blocklist is first folded into a Bloom
  * filter (Spark's own `BloomFilterAggregate`, the expression behind AQE
  * runtime filters — built distributed, merged on the driver as one
  * `numBits/8`-byte blob, re-shipped as a plan literal exactly like the
  * injected runtime-filter subquery). The corpus then splits on
  * `might_contain`:
  *
  *   - rows the filter rejects are GUARANTEED absent from the blocklist
  *     (Bloom filters have no false negatives) → emitted map-only,
  *     straight from the scan, no shuffle;
  *   - rows the filter accepts (≈ |blocklist| · (1 + fpp)) — only these
  *     take the exact `left_anti` join, so the shuffle carries the
  *     false-positive band, not the corpus.
  *
  * The result is EXACTLY the anti join (false positives are re-checked,
  * false negatives don't exist — hash-verified against a plain anti-join
  * oracle); the Bloom filter only routes rows. The corpus branch reads the
  * scan twice (once per branch) — two map-only column-pruned scans in
  * place of a corpus-wide exchange is the winning trade at scale, and the
  * branches share the scan via Spark's exchange/subquery reuse when the
  * planner proves them identical.
  *
  * Keys are hashed to 64 bits (`xxhash64`) before insert/probe — the same
  * scheme `InjectRuntimeFilter` uses; an xxhash collision only widens the
  * false-positive band (re-checked exactly), never drops a row.
  */
object Blocklist {

  /** Exact `df MINUS keys-in-blocklist` by `keyCol`, Bloom-routed.
    *
    * @param fpp    target false-positive rate for the routing filter —
    *               tune DOWN (more bits) when corpus ≫ blocklist to shrink
    *               the exact-join band.
    * @param maxNumBits cap on filter size (default 64 Mbit = 8 MB blob,
    *               Spark's own runtime-filter ceiling).
    */
  def bloomAntiJoin(df: DataFrame, blocklist: DataFrame, keyCol: String,
      fpp: Double = 0.01, maxNumBits: Long = 1L << 26): DataFrame = {
    require(fpp > 0 && fpp < 1, "need 0 < fpp < 1")
    val keys = blocklist.select(col(keyCol)).filter(col(keyCol).isNotNull)
    // one driver-side scalar: the list's cardinality sizes the filter
    // (count + optimal-bits formula, same sizing BloomFilter.create uses).
    // An empty list means nothing to remove — and BloomFilterAggregate over
    // zero rows yields a NULL blob whose might_contain would null out both
    // branches, so the identity short-circuit is correctness, not a fast path.
    val cnt = keys.count()
    if (cnt == 0) return df
    val n = cnt
    val numBits = math.min(maxNumBits, math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong))
    val bloomBlob = keys
      .select(shim.column(new BloomFilterAggregate(
          shim.expression(xxhash64(col(keyCol))),
          shim.expression(lit(n)), shim.expression(lit(numBits)))
        .toAggregateExpression()).as("_bloom"))
      .head().getAs[Array[Byte]](0)
    val might: Column = shim.column(BloomFilterMightContain(
      shim.expression(lit(bloomBlob)), shim.expression(xxhash64(col(keyCol)))))
    val clean = df.filter(!might)
    val suspects = df.filter(might)
      .join(keys.distinct(), Seq(keyCol), "left_anti")
    clean.unionByName(suspects)
  }
}
