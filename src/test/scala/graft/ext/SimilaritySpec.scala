package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §7.5(b): similarity-search semantics on hand-checked vectors. */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to 1
    (3L, Seq(2.0f, 0.0f, 0.0f)),   // parallel to 1
    (4L, Seq(1.0f, 1.0f, 0.0f))    // 45° to 1 and 2
  ).toDF("vec_id", "embedding")

  test("dot/cosine expression: exact values") {
    val d = vecs.filter($"vec_id" === 4L)
      .select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .head().getDouble(0)
    assert(d === 2.0)
  }

  test("bruteForceTopK: exact neighbors, cosine values, rank order, no self-pairs") {
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val q1 = out.filter(_._1 == 1L).sortBy(_._4)
    // For query 1: cos(1,3)=1.0, cos(1,4)=1/sqrt(2), cos(1,2)=0
    assert(q1.map(_._2).toSeq === Seq(3L, 4L, 2L))
    assert(q1(0)._3 === 1.0)
    assert(math.abs(q1(1)._3 - 1.0 / math.sqrt(2)) < 1e-9)
    assert(q1(2)._3 === 0.0)
    assert(out.forall(r => r._1 != r._2))
  }

  test("bruteForceTopK: ties broken by ascending neighbor id") {
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // For query 2: vecs 1 and 3 are both cosine 0 ties → id order 1 then 3
    val q2 = out.filter(_._1 == 2L).sortBy(_._3)
    assert(q2.map(_._2).toSeq === Seq(4L, 1L, 3L))
  }

  test("cosineNearDups: threshold inclusive, a < b ordering") {
    val out = Similarity.cosineNearDups(vecs, "vec_id", "embedding", 0.99)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 3L)))
    val all = Similarity.cosineNearDups(vecs, "vec_id", "embedding", -1.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(all.forall(p => p._1 < p._2))
    assert(all.length === 6) // all C(4,2) pairs
  }

  test("all-pairs baselines: maxExactRows guard trips, names the scale-safe path") {
    val e1 = intercept[IllegalArgumentException](
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 3, maxExactRows = 3L))
    assert(e1.getMessage.contains("lshTopK"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.cosineNearDups(vecs, "vec_id", "embedding", 0.5, maxExactRows = 3L))
    assert(e2.getMessage.contains("cosineNearDupsBlocked"))
    // at the cap, both still run
    assert(Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 1,
      maxExactRows = 4L).count() === 4L)
  }

  test("cosineNearDupsBlocked: subset of exact result, parallel vectors " +
    "always recalled, no nested-loop/cartesian plan") {
    val exact = Similarity.cosineNearDups(vecs, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val blocked = Similarity.cosineNearDupsBlocked(vecs, "vec_id", "embedding",
      0.5, nPlanes = 4, bands = 2, dims = 3)
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // candidates-then-verify: every reported pair is exact-verified
    got.foreach { case (pair, cos) => assert(exact(pair) === cos) }
    // parallel vectors sit on the same side of every hyperplane → identical
    // bucket in every band → guaranteed candidate
    assert(got.contains((1L, 3L)))
    assert(got.keySet.forall(p => p._1 < p._2))
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("cosineNearDupsBlockedAgainst: cross-side pairs only, parallel " +
    "vectors recalled, same-side dups invisible") {
    // new side: 3 (parallel to corpus 1) and 2 (orthogonal to 1, parallel
    // to corpus 20); corpus near-pair (1, 10) is same-side and must not show
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (10L, Seq(1.0f, 0.01f, 0.0f)), // near-dup of 1, same side
      (20L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (3L, Seq(2.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupsBlockedAgainst(fresh, corpus,
        "vec_id", "embedding", 0.9, nPlanes = 4, bands = 2, dims = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((3L, 1L)) === 1.0 && got((3L, 10L)) > 0.9)
    assert(got((2L, 20L)) === 1.0)
    assert(got.keySet.forall { case (a, b) => Set(2L, 3L)(a) && !Set(2L, 3L)(b) })
  }

  test("cosineNearDupsBlockedAgainstBuckets: maintained bucket table " +
    "reproduces the recompute path exactly") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (10L, Seq(1.0f, 0.01f, 0.0f)),
      (20L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (3L, Seq(2.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val buckets = Similarity.bandedSignTable(corpus, "vec_id", "embedding",
      nPlanes = 4, bands = 2, dims = 3)
    val viaTable = Similarity.cosineNearDupsBlockedAgainstBuckets(fresh,
        buckets, corpus, "vec_id", "embedding", 0.9, nPlanes = 4, bands = 2,
        dims = 3)
      .collect().map(_.toSeq).toSet
    val recompute = Similarity.cosineNearDupsBlockedAgainst(fresh, corpus,
        "vec_id", "embedding", 0.9, nPlanes = 4, bands = 2, dims = 3)
      .collect().map(_.toSeq).toSet
    assert(viaTable === recompute)
    assert(viaTable.nonEmpty)
  }

  test("cosineNearDupsBlockedAgainstBuckets: bucket table APPENDED across " +
    "corpus growth still equals the recompute path") {
    // the x42 production claim: each ingest batch computes its own
    // (id, band, bucket) rows with the same deterministic hyperplanes and
    // APPENDS them; the corpus is never re-hashed. Two generations into one
    // parquet table, then a delta batch must match vectors from both.
    val gen0 = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (20L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val gen1 = Seq(
      (30L, Seq(1.0f, 0.01f, 0.0f)), // near-dup of gen0's 1
      (31L, Seq(0.0f, 0.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("bucket_append").toString
    val table = s"$dir/embed_buckets"
    def buckets(df: org.apache.spark.sql.DataFrame) =
      Similarity.bandedSignTable(df, "vec_id", "embedding",
        nPlanes = 4, bands = 2, dims = 3)
    buckets(gen0).write.mode("overwrite").parquet(table)
    buckets(gen1).write.mode("append").parquet(table)
    val grown = gen0.unionByName(gen1)
    val batch = Seq(
      (3L, Seq(2.0f, 0.0f, 0.0f)),  // parallel to 1 (gen0) and ~30 (gen1)
      (2L, Seq(0.0f, 3.0f, 0.0f))   // parallel to 20 (gen0)
    ).toDF("vec_id", "embedding")
    val viaTable = Similarity.cosineNearDupsBlockedAgainstBuckets(batch,
        spark.read.parquet(table), grown, "vec_id", "embedding", 0.9,
        nPlanes = 4, bands = 2, dims = 3)
      .collect().map(_.toSeq).toSet
    val recompute = Similarity.cosineNearDupsBlockedAgainst(batch, grown,
        "vec_id", "embedding", 0.9, nPlanes = 4, bands = 2, dims = 3)
      .collect().map(_.toSeq).toSet
    assert(viaTable === recompute)
    val matched = viaTable.map(r => r(1).asInstanceOf[Long])
    assert(matched.contains(1L) && matched.contains(30L))
  }

  test("ivfTopKRefined: refinement keeps dense per-query ranks and is partitioning-invariant") {
    val run1 = Similarity.ivfTopKRefined(vecs.repartition(1), "vec_id", "embedding",
      k = 3, nCells = 2).collect().map(_.toSeq).toSet
    val run2 = Similarity.ivfTopKRefined(vecs.repartition(3), "vec_id", "embedding",
      k = 3, nCells = 2).collect().map(_.toSeq).toSet
    assert(run1 === run2) // decimal-sum centroids: order-independent means
    assert(run1.nonEmpty)
    run1.groupBy(_.head).foreach { case (_, rows) =>
      assert(rows.map(_.last.asInstanceOf[Int]).toSeq.sorted === (1 to rows.size))
    }
  }

  test("quantizeInt8: scale, codes, saturation, zero-vector safety") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(math.abs(r1.getDouble(1) - 1.0 / 127) < 1e-9)  // scale = max|v|/127
    assert(r1.getString(2) === "64,-127,32")  // floor(v/scale + .5)
    assert(r1.getInt(3) === 1)                // one saturated lane (the max)
    val r2 = out(2L)
    assert(r2.getDouble(1) === 0.0 && r2.getString(2) === "0,0,0" && r2.getInt(3) === 0)
  }

  test("planeSign/planes: deterministic ±1 hyperplanes") {
    val p1 = Similarity.planes(8, 64)
    val p2 = Similarity.planes(8, 64)
    assert(p1 === p2)
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("ivfTopKProbed: nprobe = nCells recovers the exact result; nprobe=1 equals ivfTopK") {
    // with every cell probed, the candidate set per query is the whole
    // corpus → identical to brute force
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    val probedAll = Similarity.ivfTopKProbed(vecs, "vec_id", "embedding",
      k = 3, nCells = 2, nprobe = 2).collect().map(_.toSeq).toSet
    assert(probedAll === exact)
    val one = Similarity.ivfTopKProbed(vecs, "vec_id", "embedding",
      k = 3, nCells = 2, nprobe = 1).collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      k = 3, nCells = 2).collect().map(_.toSeq).toSet
    assert(one === ivf)
  }

  test("topKRecallReport: full-coverage ANN scores recall 1.0 in every " +
    "band; a half-coverage ANN loses exactly the uncovered neighbors") {
    // 16 vectors in two well-separated clusters around the two axes
    val emb = (0L until 16L).map { i =>
      val base = if (i % 2 == 0) Seq(1.0f, 0.0f) else Seq(0.0f, 1.0f)
      (i, Seq(base(0) + 0.01f * i, base(1) + 0.013f * (i % 5)))
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
    val full = Similarity.topKRecallReport(emb, "vec_id", "embedding",
      k = 3, ann = exact).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0)
      assert(r.getAs[Long]("n_found") === r.getAs[Long]("n_exact"))
    }
    // ANN that only ever returns neighbors with even ids: recall over all
    // bands must equal the fraction of exact neighbors with even ids
    val partial = exact.filter(col("neighbor_id") % 2 === 0)
    val rep = Similarity.topKRecallReport(emb, "vec_id", "embedding",
      k = 3, ann = partial).collect()
    val nExact = rep.map(_.getAs[Long]("n_exact")).sum
    val nFound = rep.map(_.getAs[Long]("n_found")).sum
    val evenExact = exact.filter(col("neighbor_id") % 2 === 0).count()
    assert(nExact === exact.count() && nFound === evenExact)
    // monotone in nprobe on the IVF family (aggregate recall)
    def agg(np: Int): (Long, Long) = {
      val r = Similarity.topKRecallReport(emb, "vec_id", "embedding", k = 3,
        ann = Similarity.ivfTopKProbed(emb, "vec_id", "embedding", k = 3,
          nCells = 4, nprobe = np)).collect()
      (r.map(_.getAs[Long]("n_found")).sum, r.map(_.getAs[Long]("n_exact")).sum)
    }
    val by = (1 to 4).map(agg)
    assert(by.forall(_._2 == by.head._2))
    assert(by.map(_._1).sliding(2).forall(s => s(0) <= s(1)))
    // nprobe = nCells is exhaustive → perfect recall
    assert(by.last._1 === by.last._2)
  }

  test("refreshedCentroids: a drifted batch triggers the re-seed, a " +
    "stable batch keeps the table, and routing stays deterministic") {
    // corpus hugging the x-axis, second dim cycling i % 4: the 4
    // smallest-id seeds split it into 4 equal cells of 6
    val corpus = (0L until 24L).map(i => (i, Seq(1.0f, 0.01f * (i % 4))))
      .toDF("vec_id", "embedding")
    val cents = Similarity.centroidTable(corpus, "vec_id", "embedding", 4)
    val refOcc = Similarity.cellOccupancy(corpus, "vec_id", "embedding", cents)
    assert(refOcc.collect().map(_.getLong(1)).toSeq === Seq.fill(4)(6L))
    // stable batch: same distribution → tv ≈ 0 → table kept as-is
    val stable = (100L until 112L).map(i => (i, Seq(1.0f, 0.01f * (i % 4))))
      .toDF("vec_id", "embedding")
    val (kept, r1) = Similarity.refreshedCentroids(
      corpus.unionByName(stable), "vec_id", "embedding", 4,
      cents, refOcc, stable, tau = 0.5)
    assert(!r1)
    assert(kept.select("_cid").collect().map(_.getLong(0)).toSet ===
      cents.select("_cid").collect().map(_.getLong(0)).toSet)
    // drifted batch: orthogonal cluster — every vector lands in the one
    // cell whose seed has the largest y-component → tv = 0.75 EXACTLY
    // (integer drift algebra: 3·|6·12−0·24| + |6·12−12·24| over 2·24·12)
    val drifted = (200L until 212L).map(i => (i, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val report = Similarity.centroidDriftReport(
      refOcc.withColumnRenamed("c", "c_ref"),
      Similarity.cellOccupancy(drifted, "vec_id", "embedding", cents)
        .withColumnRenamed("c", "c_cur"),
      tau = 0.5).collect()
    assert(report.forall(_.getAs[Double]("tv") === 0.75))
    assert(report.forall(_.getAs[Boolean]("refresh")))
    val snapshot = corpus.unionByName(drifted)
    val (fresh, r2) = Similarity.refreshedCentroids(snapshot, "vec_id",
      "embedding", 4, cents, refOcc, drifted, tau = 0.5)
    assert(r2)
    // the re-seed genuinely adapts: at least one refined centroid moves
    // off the pure x-axis shape toward the drifted cluster
    val freshVecs = fresh.select("_cvec").collect()
      .map(_.getSeq[Double](0))
    assert(freshVecs.exists(v => v(1) > 0.5))
    // determinism: replaying the policy gives the same table and the
    // same routing
    val (fresh2, _) = Similarity.refreshedCentroids(snapshot, "vec_id",
      "embedding", 4, cents, refOcc, drifted, tau = 0.5)
    assert(fresh2.collect().map(_.toSeq).toSet ===
      fresh.collect().map(_.toSeq).toSet)
    val route1 = Similarity.cellAssignmentsAgainst(snapshot, "vec_id",
      "embedding", fresh).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val route2 = Similarity.cellAssignmentsAgainst(
      snapshot.repartition(5), "vec_id", "embedding", fresh2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(route1 === route2)
  }

  test("ivfQuantizedRescoreTopK: candK covering the cell recovers the exact IVF result") {
    // rescore is exact, so with every in-cell candidate surviving the
    // quantized cut the result must equal plain IVF top-k
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", k = 3, nCells = 2)
      .collect().map(_.toSeq).toSet
    val rescored = Similarity.ivfQuantizedRescoreTopK(vecs, "vec_id", "embedding",
      k = 3, nCells = 2, candK = 4).collect().map(_.toSeq).toSet
    assert(rescored === ivf)
  }

  test("ivfPqAdcTopK: candK covering the cell recovers the exact IVF " +
    "result; codes beat cells at pruning parallel matches") {
    // the rescore is exact, so with every in-cell candidate surviving the
    // ADC cut the result must equal plain IVF top-k — same invariant as
    // the int8 path, now through the codebook distance
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", k = 3, nCells = 2)
      .collect().map(_.toSeq).toSet
    val pq = Similarity.ivfPqAdcTopK(vecs, "vec_id", "embedding",
      k = 3, nCells = 2, m = 3, ksub = 4, candK = 4, dims = 3)
      .collect().map(_.toSeq).toSet
    assert(pq === ivf)
    // with ksub = n every per-dim codebook contains each exact coordinate,
    // so the ADC distance of the parallel pair (1,3) through codes must
    // rank 3 first for query 1 even at candK = 1
    val tight = Similarity.ivfPqAdcTopK(vecs, "vec_id", "embedding",
      k = 1, nCells = 2, m = 3, ksub = 4, candK = 1, dims = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tight(1L) === 3L)
  }

  test("ivfTopK: co-located parallel vectors rank exactly within their cell") {
    val out = Similarity.ivfTopK(vecs, "vec_id", "embedding", k = 3, nCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // Centroids are vecs 1 and 2. Vec 3 (parallel to 1) must land in cell 1
    // with cosine 1.0 to vec 1 at rank 1 from vec 1's perspective.
    val q1 = out.filter(_._1 == 1L)
    assert(q1.nonEmpty && q1.minBy(_._4)._2 === 3L && q1.minBy(_._4)._3 === 1.0)
    // ranks are dense 1..n per query
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length))
    }
  }

  test("lshTopK: results are a subset of pair universe with bucket-local exact ranks") {
    val out = Similarity.lshTopK(vecs, "vec_id", "embedding", k = 3,
      nPlanes = 2, dims = 3).collect()
    // Parallel vectors always share every sign bucket → (1,3) must survive.
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((3L, 1L)))
    // Ranks within each query are 1..n without gaps.
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length))
    }
  }

  test("semanticDedup: within-cell clusters collapse to min-id canonical; " +
    "below-threshold and lone members survive; partition-invariant") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),    // centroid A
      (2L, Seq(0.0f, 1.0f)),    // centroid B
      (3L, Seq(2.0f, 0.0f)),    // cell A, cos(1,3)=1 → drops into {1}
      (4L, Seq(0.0f, 3.0f)),    // cell B, cos(2,4)=1 → drops into {2}
      (5L, Seq(0.9f, 1.0f)),    // cell B, cos to 2 and 4 ≈ .743 < .9 → kept
      (6L, Seq(1.0f, 0.1f))     // cell A, cos to 1,3 ≈ .995 → joins {1,3}
    ).toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.semanticDedup(d, "vec_id", "embedding",
        nCells = 2, minCos = 0.9)
        .select("vec_id").as[Long].collect().toSet
    val out = run(emb)
    assert(out === Set(1L, 2L, 5L))
    assert(run(emb.repartition(5)) === out)
    // pair evidence is cell-local: the pair list never crosses cells
    val cellOf = Map(1L -> "A", 3L -> "A", 6L -> "A",
      2L -> "B", 4L -> "B", 5L -> "B")
    Similarity.cellNearDupPairs(emb, "vec_id", "embedding", 2, 0.0)
      .collect().foreach { r =>
        assert(cellOf(r.getLong(0)) === cellOf(r.getLong(1)))
      }
  }

  test("cellAssignments: deterministic, total (every vector gets a cell), " +
    "cells drawn from the seed ids; composes with the per-stratum cap") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(2f, 0.1f)), (4L, Array(0.1f, 3f)), (5L, Array(-1f, -1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cellAssignments(emb, "vec_id", "embedding", nCells = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(out.values.toSet.subsetOf(Set(1L, 2L))) // seeds = 2 smallest ids
    assert(out(3L) === 1L && out(4L) === 2L)       // nearest centroid wins
    val again = Similarity
      .cellAssignments(emb.repartition(4), "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
    val capped = Corpus.stratifiedSample(
      Similarity.cellAssignments(emb, "vec_id", "embedding", 2),
      "cell", "vec_id", k = 1)
    assert(capped.count() === 2L) // one survivor per semantic cell
  }

  test("cellAssignmentsAgainst: equals the direct assignment when the " +
    "table comes from the same corpus; stored row order is irrelevant") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(2f, 0.1f)), (4L, Array(0.1f, 3f)), (5L, Array(-1f, -1f))
    ).toDF("vec_id", "embedding")
    val direct = Similarity.cellAssignments(emb, "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val table = Similarity.centroidTable(emb, "vec_id", "embedding", 2)
    val viaTable = Similarity
      .cellAssignmentsAgainst(emb, "vec_id", "embedding", table)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaTable === direct)
    // a shuffled/reversed table yields the same assignment — ties break on
    // centroid id inside the sort, not on array position
    val reversed = table.orderBy(col("_cid").desc).repartition(3)
    val viaReversed = Similarity
      .cellAssignmentsAgainst(emb, "vec_id", "embedding", reversed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaReversed === direct)
  }

  test("kmeansCentroids: Lloyd rounds move centroids to cluster means, " +
    "iters=0 returns the seeds, empty cells vanish") {
    // two tight cosine clusters; seeds (ids 1, 2) both sit in cluster A,
    // so round 1 must migrate one centroid toward cluster B
    val emb = Seq(
      (1L, Array(1f, 0.1f)), (2L, Array(1f, -0.1f)), (3L, Array(1f, 0f)),
      (4L, Array(0.1f, 1f)), (5L, Array(-0.1f, 1f)), (6L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val seeds = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 2, iters = 0)
    assert(seeds.select("_cid").as[Long].collect().sorted === Array(1L, 2L))
    val c2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 2, iters = 2)
    val asn = Similarity
      .cellAssignmentsAgainst(emb, "vec_id", "embedding", c2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after two rounds the x-cluster and y-cluster separate cleanly
    assert(Set(asn(1L), asn(2L), asn(3L)).size === 1)
    assert(Set(asn(4L), asn(5L), asn(6L)).size === 1)
    assert(asn(1L) !== asn(4L))
    // k = corpus size: every vector is its own seed; a later round keeps
    // at most that many cells (none can split)
    val cAll = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 6, iters = 1)
    assert(cAll.count() <= 6L)
  }

  test("centroidPrototypicality: cosine to the OWN label's centroid, " +
    "partitioning-invariant; top fraction keeps the most central") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0), (3L, Array(1f, 1f), 0),
      (4L, Array(-1f, 0f), 1), (5L, Array(-1f, 0.1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidPrototypicality(emb, "label", "vec_id", "embedding")
    val byId = out.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("proto_cos")).toMap
    // label 0 centroid = (2/3, 2/3): vec 3 is perfectly aligned, 1 and 2 tie
    assert(math.abs(byId(3L) - 1.0) < 1e-12)
    assert(math.abs(byId(1L) - 1.0 / math.sqrt(2)) < 1e-9)
    assert(byId(1L) === byId(2L))
    assert(byId(4L) > 0.9 && byId(5L) > 0.9) // own-label centroid, not global
    // invariant under repartitioning (decimal-exact centroid, fold cosine)
    val again = Similarity
      .centroidPrototypicality(emb.repartition(7), "label", "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("proto_cos")).toMap
    assert(again === byId)
    // composed prune: label 0 keeps ceil(3·0.34)=2 — the aligned vec 3
    // plus tie-winner 2 (ties keep the larger id); label 1 keeps ceil(2·
    // 0.34)=1 — vec 5, whose cosine to the (-1, 0.05) centroid is higher
    val kept = Corpus.topFractionByMetric(out, "label", "vec_id", "proto_cos", 0.34)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L, 5L))
  }

  test("marginMine: top-2 cosines, difference margin, lone-candidate " +
    "cos2 NULL, accept threshold") {
    // index: 10 ≈ x-axis, 11 = 45°, 12 = y-axis; queries: 1 ≈ x-axis
    // (clear winner 10 over 11), 2 = y-axis (nearest 12, runner-up 11)
    val index = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(1.0f, 1.0f)), (12L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq(
      (1L, Seq(0.99f, 0.01f)), (2L, Seq(0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    // nCells = 3: every index vector is its own cell → per-cell candidate
    // sets are singletons, exercising the cos2-NULL path
    val lone = Similarity.marginMine(queries, index, "vec_id", "embedding",
      nCells = 3, minMargin = 0.05)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("nn_id"), Option(r.getAs[java.lang.Double]("cos2")),
          r.getAs[Double]("margin"), r.getAs[Boolean]("accept"))).toMap
    assert(lone(1L)._1 === 10L && lone(1L)._2.isEmpty)
    assert(lone(1L)._4, "margin vs an orthogonal 0 runner-up accepts")
    // nCells = 1: all candidates share the cell → true top-2 everywhere
    val full = Similarity.marginMine(queries, index, "vec_id", "embedding",
      nCells = 1, minMargin = 0.05)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("nn_id"), r.getAs[Double]("cos1"),
          r.getAs[Double]("cos2"), r.getAs[Double]("margin"),
          r.getAs[Boolean]("accept"))).toMap
    val (nn1, c1a, c1b, m1, a1) = full(1L)
    assert(nn1 === 10L && c1a > 0.999 && math.abs(c1b - math.cos(math.Pi / 4 - 0.0101)) < 0.01)
    assert(math.abs(m1 - (c1a - c1b)) < 1e-9 && a1 === (m1 > 0.05))
    val (nn2, c2a, c2b, m2, a2) = full(2L)
    assert(nn2 === 12L && c2a === 1.0)
    assert(math.abs(c2b - 1.0 / math.sqrt(2)) < 1e-9)
    assert(m2 > 0.05 && a2)
  }

  test("labelPropagate: nearest labeled neighbor within the cell wins, " +
    "confidence kept, label-free cells predict nothing") {
    // nCells = 1: one cell, pure 1-NN against the labeled side
    val labeled = Seq(
      (1L, Seq(1.0f, 0.0f), 7),
      (2L, Seq(0.0f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val unlabeled = Seq(
      (10L, Seq(0.9f, 0.1f)),   // closest to vec 1 -> label 7
      (11L, Seq(0.1f, 0.9f))    // closest to vec 2 -> label 9
    ).toDF("vec_id", "embedding")
    val out = Similarity.labelPropagate(labeled, unlabeled, "vec_id",
      "embedding", "label", nCells = 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("pred_label"), r.getAs[Long]("neighbor_id"),
          r.getAs[Double]("cosine"))).toMap
    assert(out(10L)._1 === 7 && out(10L)._2 === 1L)
    assert(out(11L)._1 === 9 && out(11L)._2 === 2L)
    assert(out(10L)._3 > 0.99 && out(11L)._3 > 0.99)
    // isolate the labeled side in its own cell: with nCells = 2 the seed
    // centroids are vecs 1 and 2; an unlabeled vector landing in a cell
    // with NO labeled member is absent (here: make label side tiny)
    val oneLab = labeled.filter(col("vec_id") === 1L)
    val far = Seq((12L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out2 = Similarity.labelPropagate(oneLab, far, "vec_id",
      "embedding", "label", nCells = 2)
      .collect()
    // seeds = vecs 1 and 12; vec 12 sits in its own cell, no labeled
    // neighbor there -> no prediction
    assert(out2.isEmpty)
  }

  test("cellPurity: majority label, ties to smaller label, null labels " +
    "count toward n but never vote") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f), Integer.valueOf(7)),
      (2L, Seq(0.9f, 0.1f), Integer.valueOf(7)),
      (3L, Seq(0.8f, 0.2f), Integer.valueOf(9)),
      (4L, Seq(0.85f, 0.15f), null.asInstanceOf[Integer])
    ).toDF("vec_id", "embedding", "label")
    // nCells = 1: one cell holding all four vectors
    val out = Similarity.cellPurity(e, "vec_id", "embedding", "label",
      nCells = 1).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Int]("majority_label") === 7)
    assert(r.getAs[Long]("majority_n") === 2L)
    assert(r.getAs[Double]("purity") === 0.5) // null-label row dilutes
    // tie: two labels with one vote each -> smaller label wins
    val tie = Seq(
      (1L, Seq(1.0f, 0.0f), 9), (2L, Seq(0.9f, 0.1f), 3)
    ).toDF("vec_id", "embedding", "label")
    val t = Similarity.cellPurity(tie, "vec_id", "embedding", "label",
      nCells = 1).collect().head
    assert(t.getAs[Int]("majority_label") === 3)
  }
}
