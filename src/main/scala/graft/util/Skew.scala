package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic key salting for skewed joins.
  *
  * A shuffled equi-join on a low-cardinality or hot-key column sends every
  * row of a hot key to ONE reducer — the classic straggler no partition
  * count fixes. Salting splits each hot key into `salt` sub-keys: the
  * skewed side gets a per-row salt derived from a hash of the whole row
  * (deterministic — same input, same plan, unlike a `rand()` salt), and
  * the dimension side is replicated `salt` times so every sub-key still
  * finds its match. The join result is EXACTLY the plain join's (each
  * skewed row matches exactly the one dim replica with its salt).
  *
  * This is the manual lever for the cases AQE's skew-join splitting does
  * not reach (e.g. skewed aggregate feeding a join, or a build side too
  * big to broadcast but small enough to replicate `salt` ways).
  */
object Skew {

  /** The skewed side with its deterministic per-row `_salt` sub-key —
    * exposed so callers and specs can inspect the distribution the join
    * actually shuffles on: each original key splits into up to `salt`
    * (key, _salt) groups of ~1/salt the rows, which IS the bound on any
    * one reducer's input attributable to that key.
    */
  def salted(skewed: DataFrame, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val rowHash = xxhash64(struct(skewed.columns.map(col): _*))
    skewed.withColumn("_salt", pmod(rowHash, lit(salt.toLong)).cast("int"))
  }

  /** Equi-join `skewed ⋈ dim` on `keys`, salted `salt` ways. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    val right = dim.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    salted(skewed, salt).join(right, keys :+ "_salt", joinType).drop("_salt")
  }
}
