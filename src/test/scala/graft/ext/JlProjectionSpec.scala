package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss ±1 projection: exact quantized values against a
  * scalar reference implementation, structure preservation, and the
  * all-pairs guard on the measurement harness.
  */
class JlProjectionSpec extends SparkSpec {

  import spark.implicits._

  private val dims = 8
  private val vecs = Seq(
    (1L, Seq(0.5f, -0.25f, 0.125f, 1.0f, -1.0f, 0.75f, -0.5f, 0.0f)),
    (2L, Seq(0.5f, -0.25f, 0.125f, 1.0f, -1.0f, 0.75f, -0.5f, 0.0f)), // dup of 1
    (3L, Seq(1.0f, 0.5f, -0.25f, 0.125f, 0.0f, -1.0f, 0.75f, -0.5f)),
    (4L, Seq(-0.5f, 0.25f, -0.125f, -1.0f, 1.0f, -0.75f, 0.5f, 0.0f)), // -1 × vec 1
    (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  /** Scalar reference: the same floor-quantize + ±1 dot, in plain Scala. */
  private def reference(v: Seq[Float], outDims: Int): Seq[Long] = {
    val qv = v.map(x => math.floor(x.toDouble * Similarity.JlScale).toLong)
    (0 until outDims).map { k =>
      qv.indices.map(j => qv(j) * Similarity.jlSign(k, j)).sum
    }
  }

  test("jlSign is ±1, deterministic, and distinct from the LSH plane set") {
    val s = for (k <- 0 until 4; j <- 0 until dims) yield Similarity.jlSign(k, j)
    assert(s.forall(v => v == 1L || v == -1L))
    assert(s === (for (k <- 0 until 4; j <- 0 until dims) yield Similarity.jlSign(k, j)))
    // both signs occur (a constant matrix would project everything onto
    // the same line) and the namespace differs from planeSign's
    assert(s.toSet.size === 2)
    val plane = for (k <- 0 until 4; j <- 0 until dims)
      yield if (Similarity.planeSign(k, j) > 0) 1L else -1L
    assert(s !== plane)
  }

  test("jlProject matches the scalar reference exactly (quantized longs)") {
    val out = Similarity.jlProject(vecs, "vec_id", "embedding", outDims = 4, inDims = dims)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    val expected = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f, 1.0f, -1.0f, 0.75f, -0.5f, 0.0f)),
      (3L, Seq(1.0f, 0.5f, -0.25f, 0.125f, 0.0f, -1.0f, 0.75f, -0.5f)),
      (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 1.0f))
    ).map { case (id, v) => id -> reference(v, 4) }.toMap
    for ((id, exp) <- expected)
      assert(out.toMap.apply(id) === exp, s"vec $id")
    // duplicates project identically
    assert(out.toMap.apply(1L) === out.toMap.apply(2L))
    // negation flips every component (floor is not odd-symmetric in
    // general, but every component here is an exact multiple of 1/2⁴·10⁴)
    assert(out.toMap.apply(4L) === out.toMap.apply(1L).map(-_))
  }

  test("jlTopK: duplicate is rank 1 at cosine 1.0; negation is cosine -1; " +
    "k rows per query") {
    val out = Similarity.jlTopK(vecs, "vec_id", "embedding", k = 4,
      outDims = 8, inDims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.count(_._1 == 1L) === 4)
    val q1 = out.filter(_._1 == 1L).sortBy(_._4)
    assert(q1.head._2 === 2L && q1.head._3 === 1.0)
    assert(q1.find(_._2 == 4L).get._3 === -1.0)
    assert(out.forall(r => r._1 != r._2))
    assert(out.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
  }

  test("projected cosine approximates full-dim cosine (JL structure holds)") {
    // identity-dimensional projection is a signed rotation-ish transform;
    // compare projected vs full cosine for every pair at outDims = inDims
    val full = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val proj = Similarity.jlTopK(vecs, "vec_id", "embedding", k = 4,
      outDims = 8, inDims = dims)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // exact-relation pairs (dup, negation) are preserved exactly; the
    // rest within the dimension-free JL distortion bound for this tiny set
    for ((pair, c) <- full)
      assert(math.abs(proj(pair) - c) < 0.5, s"$pair: full=$c proj=${proj(pair)}")
  }

  test("jlTopK all-pairs guard trips and names the scale path") {
    val e = intercept[IllegalArgumentException](
      Similarity.jlTopK(vecs, "vec_id", "embedding", k = 2,
        outDims = 4, inDims = dims, maxExactRows = 3L))
    assert(e.getMessage.contains("ivfTopK"))
  }

  test("jlIvfTopK at nCells=1 degenerates to jlTopK (single cell = all pairs)") {
    val ivf = Similarity.jlIvfTopK(vecs, "vec_id", "embedding", k = 4,
      outDims = 8, inDims = dims, nCells = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = Similarity.jlTopK(vecs, "vec_id", "embedding", k = 4,
      outDims = 8, inDims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(ivf === exact)
  }

  test("jlIvfTopK at nprobe=nCells recovers the duplicate at rank 1") {
    // with every cell probed the candidate set is the full corpus minus
    // cross-cell CORPUS rows only when cells differ; dup vectors project
    // identically so they share a cell — rank 1 at cosine 1.0 regardless
    val out = Similarity.jlIvfTopK(vecs, "vec_id", "embedding", k = 2,
      outDims = 8, inDims = dims, nCells = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val q1 = out.filter(t => t._1 == 1L && t._4 == 1)
    assert(q1.length === 1 && q1.head._2 === 2L && q1.head._3 === 1.0)
  }

  test("jlIvfRescoreTopK: routing in JL space, cosines in ORIGINAL space " +
    "(= bruteForceTopK values on returned pairs); nCells=1 = exact top-k") {
    // single cell: candidate set is all pairs, so rescore == brute force
    val rescored = Similarity.jlIvfRescoreTopK(vecs, "vec_id", "embedding",
      k = 4, outDims = 8, inDims = dims, nCells = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rescored === exact)
    // multi-cell: every returned cosine is the true full-precision cosine
    // (the rescore contract), unlike jlIvfTopK's projected-space scores
    val multi = Similarity.jlIvfRescoreTopK(vecs, "vec_id", "embedding",
      k = 2, outDims = 8, inDims = dims, nCells = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val trueCos = exact.map(t => (t._1, t._2) -> t._3).toMap
    multi.foreach { case (pair, c) => assert(c === trueCos(pair), s"$pair") }
    // the duplicate is recovered at rank 1, cosine exactly 1.0
    val q1 = Similarity.jlIvfRescoreTopK(vecs, "vec_id", "embedding",
      k = 2, outDims = 8, inDims = dims, nCells = 2, nprobe = 2)
      .filter(col("query_id") === 1L && col("rank") === 1).collect()
    assert(q1.length === 1 && q1.head.getLong(1) === 2L &&
      q1.head.getDouble(2) === 1.0)
  }

  test("jlIvfRescoreRefinedTopK: iters=0 reproduces jlIvfRescoreTopK " +
    "bit-for-bit; iters=1 keeps true-cosine scores and the duplicate") {
    val plain = Similarity.jlIvfRescoreTopK(vecs, "vec_id", "embedding",
      k = 2, outDims = 8, inDims = dims, nCells = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val it0 = Similarity.jlIvfRescoreRefinedTopK(vecs, "vec_id", "embedding",
      k = 2, outDims = 8, inDims = dims, nCells = 2, nprobe = 2, iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(it0 === plain)
    // one Lloyd round: scores stay ORIGINAL-space cosines and the exact
    // duplicate still lands at rank 1 with cosine exactly 1.0
    val it1 = Similarity.jlIvfRescoreRefinedTopK(vecs, "vec_id", "embedding",
      k = 2, outDims = 8, inDims = dims, nCells = 2, nprobe = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val trueCos = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    it1.foreach(t => assert(t._3 === trueCos((t._1, t._2)), s"(${t._1},${t._2})"))
    val q1 = it1.filter(t => t._1 == 1L && t._4 == 1)
    assert(q1.length === 1 && q1.head._2 === 2L && q1.head._3 === 1.0)
  }

  test("jlProject rejects an expansion (outDims > inDims)") {
    val e = intercept[IllegalArgumentException](
      Similarity.jlProject(vecs, "vec_id", "embedding", outDims = 16, inDims = dims))
    assert(e.getMessage.contains("outDims"))
  }
}
