package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  * - [[bruteForceTopK]]: exact all-pairs cosine + per-query rank. O(n²·d) —
  *   the correctness baseline, and still the right choice for one bounded
  *   side (queries × corpus with a broadcast of the small side).
  * - [[lshTopK]]: random-hyperplane LSH. Each vector gets a sign-bit bucket
  *   from `p` fixed hyperplanes; ranking runs only within buckets, so the
  *   join is an equi-join on bucket (shuffle O(n), compare O(Σ bucket²)).
  *   Hyperplanes are deterministic (md5-seeded ±1), so results are
  *   reproducible across runs and engines.
  *
  * All dot products fold left-to-right in double precision — bit-identical
  * to a serial evaluation regardless of partitioning.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic ±1 hyperplane component: top bit of the first md5 nibble
    * of "plane:dim". Reproducible anywhere md5 exists (also used to build
    * the DuckDB oracle for the LSH query).
    */
  def planeSign(plane: Int, dim: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes(StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0x8) != 0) 1.0 else -1.0
  }

  def planes(nPlanes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dims).map(d => planeSign(p, d)))

  /** Sign-bucket id ('1'/'0' per hyperplane) for an embedding column. */
  def lshBucket(emb: Column, planeVectors: Seq[Seq[Double]]): Column = {
    val bits = planeVectors.map { pv =>
      val planeLit = array(pv.map(lit): _*)
      when(dot(emb, planeLit) >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Exact top-k cosine neighbors for every vector (self excluded).
    * Output: (query_id, neighbor_id, cosine, rank); ties broken by
    * neighbor id for determinism.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = emb.select(col(idCol).as("query_id"), col(vecCol).as("_va"))
    val b = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("_vb"))
    val pairs = a.join(b, col("query_id") =!= col("neighbor_id"))
      .withColumn("_cos", cosine(col("_va"), col("_vb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("_cos"), 9).as("cosine"), col("rank"))
  }

  /** Approximate top-k: rank only within the LSH sign bucket. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pv = planes(nPlanes, dims)
    val bucketed = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), pv).as("_bucket"))
    val a = bucketed.select(col(idCol).as("query_id"), col(vecCol).as("_va"),
      col("_bucket"))
    val b = bucketed.select(col(idCol).as("neighbor_id"), col(vecCol).as("_vb"),
      col("_bucket").as("_bucket2"))
    val pairs = a.join(b,
        col("_bucket") === col("_bucket2") && col("query_id") =!= col("neighbor_id"))
      .withColumn("_cos", cosine(col("_va"), col("_vb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("_cos"), 9).as("cosine"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold (a < b). */
  def cosineNearDups(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("doc_a"), col(vecCol).as("_va"))
    val b = emb.select(col(idCol).as("doc_b"), col(vecCol).as("_vb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("_cos", cosine(col("_va"), col("_vb")))
      .filter(col("_cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("_cos"), 9).as("cosine"))
  }
}
