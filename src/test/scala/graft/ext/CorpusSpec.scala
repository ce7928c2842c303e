package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus operators: deterministic stratified caps and exact vocabulary
  * ranks on hand-checked fixtures.
  */
class CorpusSpec extends SparkSpec {

  import spark.implicits._

  test("bm25TopK: shared-term ranking, rarity beats frequency, " +
    "excludeSelf drops the identity hit") {
    val docs = Seq(
      (1L, "apple banana cherry"),           // shares rare 'cherry' with q
      (2L, "apple apple apple banana"),      // shares only common 'apple'
      (3L, "durian elderberry fig"),         // shares nothing
      (4L, "cherry cherry apple")            // strongest cherry match
    ).toDF("doc_id", "text")
    val q = Seq((100L, "apple cherry")).toDF("doc_id", "text")
    val out = Corpus.bm25TopK(docs, q, "text", "doc_id", "doc_id", "text",
      k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score"), r.getAs[Int]("rank")))
    // doc 3 shares no term — absent; all hits belong to query 100
    assert(out.map(_._2).toSet === Set(1L, 2L, 4L))
    assert(out.forall(_._1 === 100L))
    // docs with the rare term 'cherry' outrank the apple-only doc
    val rankOf = out.map(t => t._2 -> t._4).toMap
    assert(rankOf(4L) < rankOf(2L) && rankOf(1L) < rankOf(2L))
    // ranks are dense from 1
    assert(out.map(_._4).sorted === Array(1, 2, 3))
    // scores are positive quantized longs
    assert(out.forall(_._3 > 0L))
    // self-exclusion: querying with a corpus row drops only the self hit
    val selfQ = docs.filter(col("doc_id") === 1L)
    val self = Corpus.bm25TopK(docs, selfQ, "text", "doc_id", "doc_id",
      "text", k = 10, excludeSelf = true).collect()
      .map(r => r.getAs[Long]("doc_id"))
    assert(!self.contains(1L) && self.nonEmpty)
  }

  test("kmvSketch/kmvJaccardEst: sketch = k smallest distinct gram " +
    "hashes; identical groups estimate 1, disjoint estimate 0; " +
    "deterministic under repartitioning") {
    val text = "a b c d e f g h i j k l"
    val other = "z y x w v u t s r q p o"
    val d = Seq(
      ("s1", text), ("s2", text),        // identical gram sets
      ("s3", other)                      // disjoint
    ).toDF("source", "text")
    val sk = Corpus.kmvSketch(d, "source", "text", k = 8, n = 3)
    val bySrc = sk.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getInt(2)))).toMap
    // 10 grams per doc, k=8 → exactly 8 rows per source, ranks 1..8,
    // hashes ascending
    bySrc.values.foreach { rows =>
      assert(rows.length === 8)
      assert(rows.map(_._2).sorted === (1 to 8).toArray)
      val hs = rows.sortBy(_._2).map(_._1)
      assert(hs.toSeq === hs.sorted.toSeq)
    }
    assert(bySrc("s1").map(_._1).toSet === bySrc("s2").map(_._1).toSet)
    val est = Corpus.kmvJaccardEst(sk, "source", k = 8).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("union_k"), r.getAs[Long]("shared_k"),
          r.getAs[Double]("jaccard_est"))).toMap
    assert(est(("s1", "s2")) === ((8L, 8L, 1.0)))
    assert(est(("s1", "s3"))._3 === 0.0 && est(("s2", "s3"))._3 === 0.0)
    // partition-layout-invariant: the sketch is a pure function of the set
    val sk2 = Corpus.kmvSketch(d.repartition(7), "source", "text", k = 8, n = 3)
    assert(sk2.collect().map(_.toSeq).toSet === sk.collect().map(_.toSeq).toSet)
  }

  test("strataTermCounts: additive on disjoint batches; " +
    "headCoverageFromCounts over the merged table equals direct") {
    val a = Seq(("en", "a a b"), ("fr", "x y")).toDF("lang", "text")
    val b = Seq(("en", "a c"), ("fr", "x x")).toDF("lang", "text")
    val merged = Corpus.strataTermCounts(a, "lang", "text")
      .unionByName(Corpus.strataTermCounts(b, "lang", "text"))
      .groupBy(col("lang"), col("term")).agg(sum(col("_cnt")).as("_cnt"))
    val whole = Corpus.strataTermCounts(a.unionByName(b), "lang", "text")
    assert(merged.collect().map(_.toSeq).toSet ===
      whole.collect().map(_.toSeq).toSet)
    val direct = Corpus.headCoverage(a.unionByName(b), "lang", "text",
      Seq((1, 2), (1, 1))).collect().map(_.toSeq).toSet
    val viaCounts = Corpus.headCoverageFromCounts(merged, "lang",
      Seq((1, 2), (1, 1))).collect().map(_.toSeq).toSet
    assert(viaCounts === direct)
  }

  test("kmvMerge: merge(sketch(A), sketch(B)) = sketch(A ∪ B) exactly") {
    val a = Seq(("s", "a b c d e f g h"), ("t", "m n o p q r s t"))
      .toDF("source", "text")
    val b = Seq(("s", "e f g h i j k l"), ("t", "u v w x y z aa bb"))
      .toDF("source", "text")
    val k = 5
    val merged = Corpus.kmvMerge(
      Corpus.kmvSketch(a, "source", "text", k, n = 3)
        .select(col("source"), col("h"))
        .unionByName(Corpus.kmvSketch(b, "source", "text", k, n = 3)
          .select(col("source"), col("h"))),
      "source", k)
    val whole = Corpus.kmvSketch(a.unionByName(b), "source", "text", k, n = 3)
    assert(merged.collect().map(_.toSeq).toSet ===
      whole.collect().map(_.toSeq).toSet)
  }

  test("cmsSketch/cmsEstimate: row sums = gram mass, estimates never " +
    "under-count and are exact when collision-free; deterministic under " +
    "repartitioning") {
    // 3 docs, 3-grams; "a b c" occurs 3x ("a b c d" contributes it once),
    // "b c d" once, "x y z" once — total gram mass 5
    val d = Seq((1L, "a b c"), (2L, "a b c d"), (3L, "a b c"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val depth = 4
    val wide = Corpus.cmsSketch(d, "text", n = 3, depth = depth,
      width = 1 << 20)
    val rows = wide.collect()
    // every hash row's counts sum to the total gram mass
    val sums = rows.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(sums === (0 until depth).map(_ -> 5L).toMap)
    // collision-free width: estimate == exact for every gram, including
    // an absent probe gram reading 0
    val probes = Seq("a b c", "b c d", "x y z", "q q q").toDF("gram")
    val est = Corpus.cmsEstimate(wide, probes, "gram", depth, 1 << 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a b c" -> 3L, "b c d" -> 1L, "x y z" -> 1L,
      "q q q" -> 0L))
    // tiny width forces collisions: estimates may overshoot, never under
    val tight = Corpus.cmsSketch(d, "text", n = 3, depth = depth, width = 2)
    val estT = Corpus.cmsEstimate(tight, probes, "gram", depth, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estT("a b c") >= 3L && estT("b c d") >= 1L && estT("x y z") >= 1L)
    assert(estT.values.forall(_ <= 5L)) // bounded by total mass
    // pure function of the gram stream: partition layout can't change it
    val re = Corpus.cmsSketch(d.repartition(7), "text", n = 3,
      depth = depth, width = 1 << 20)
    assert(re.collect().map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("cmsMerge: merge(sketch(A), sketch(B)) = sketch(A ⊎ B) exactly") {
    val a = Seq((1L, "a b c d"), (2L, "a b c")).toDF("doc_id", "text")
    val b = Seq((3L, "a b c"), (4L, "x y z w")).toDF("doc_id", "text")
    val merged = Corpus.cmsMerge(
      Corpus.cmsSketch(a, "text", n = 3, depth = 3, width = 64)
        .unionByName(Corpus.cmsSketch(b, "text", n = 3, depth = 3,
          width = 64)))
    val whole = Corpus.cmsSketch(a.unionByName(b), "text", n = 3,
      depth = 3, width = 64)
    assert(merged.collect().map(_.toSeq).toSet ===
      whole.collect().map(_.toSeq).toSet)
  }

  test("cmsHeavyHitters: sound triage — every truly φ-heavy gram " +
    "surfaces with est_n ≥ exact_n, and exact_n is the true count") {
    // "t t t" mass: docs 1-3 contribute 4+4+4 of 18 total grams (φ = 2/9);
    // every other gram appears once
    val d = Seq(
      (1L, "t t t t t t"), (2L, "t t t t t t"), (3L, "t t t t t t"),
      (4L, "a b c d e"), (5L, "p q r s")).toDF("doc_id", "text")
    // width 4 forces collisions; φ = 1/5 of N=18 → threshold 3.6
    val hh = Corpus.cmsHeavyHitters(d, "text", n = 3, depth = 4, width = 4,
      phiNum = 1, phiDen = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGram = hh.map(t => t._1 -> (t._2, t._3)).toMap
    // the truly heavy gram is present with its exact count
    assert(byGram.contains("t t t"))
    assert(byGram("t t t")._2 === 12L)
    // CMS guarantee on every surfaced row
    assert(hh.forall { case (_, est, exact) => est >= exact })
    // collision-driven false positives carry exact counts < threshold —
    // the exact column is what makes the triage a verdict, not a guess
    assert(hh.forall { case (_, _, exact) => exact >= 1L })
  }

  test("cmsHeavyHitterProbe: batch-gram probe agrees with the batch form " +
    "on the batch's grams, and probes ONLY batch grams") {
    val d = Seq(
      (1L, "t t t t t t"), (2L, "t t t t t t"), (3L, "t t t t t t"),
      (4L, "a b c d e"), (5L, "p q r s")).toDF("doc_id", "text")
    val sketch = Corpus.cmsSketch(d, "text", n = 3, depth = 4, width = 1 << 16)
    val batch = d.filter($"doc_id" >= 3L)
    val probe = Corpus.cmsHeavyHitterProbe(sketch, batch, "text", n = 3,
      depth = 4, width = 1 << 16, phiNum = 1, phiDen = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the heavy gram is in the batch (doc 3 carries it) → surfaced, with
    // the collision-free estimate = exact corpus count
    assert(probe === Map("t t t" -> 12L))
    // full-form agreement on shared grams: est values match cmsHeavyHitters
    val full = Corpus.cmsHeavyHitters(d, "text", n = 3, depth = 4,
      width = 1 << 16, phiNum = 1, phiDen = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probe.foreach { case (g, est) => assert(full(g) === est) }
    // a batch NOT containing the heavy gram yields no verdict rows: the
    // probe's work and output are batch-proportional by construction
    val cold = Corpus.cmsHeavyHitterProbe(sketch,
      d.filter($"doc_id" >= 4L), "text", n = 3,
      depth = 4, width = 1 << 16, phiNum = 1, phiDen = 5)
    assert(cold.count() === 0L)
  }

  test("cmsCommonGramStats: per-doc common-gram counts match the exact " +
    "computation when collision-free; membership = all-rows test") {
    // "t t t" appears in 5 docs (cnt 5 ≥ minCount 4); every other gram
    // is unique
    val d = (1L to 5L).map(i => (i, "t t t")).toSeq
      .++(Seq((6L, "t t t a b c"), (7L, "x y z")))
      .toDF("doc_id", "text")
    val sketch = Corpus.cmsSketch(d, "text", n = 3, depth = 4,
      width = 1 << 20)
    val out = Corpus.cmsCommonGramStats(d, "text", "doc_id", sketch,
      n = 3, depth = 4, width = 1 << 20, minCount = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // docs 1-5: their single gram "t t t" is corpus-common (cnt 6 ≥ 4)
    (1L to 5L).foreach(i => assert(out(i) === ((1L, 1L))))
    // doc 6: grams "t t t","t t a","t a b","a b c" — only the first is
    // common
    assert(out(6L) === ((4L, 1L)))
    // doc 7: one unique gram, nothing common
    assert(out(7L) === ((1L, 0L)))
  }

  test("coverageAudit: per-stratum doc/side parity; orphaned side rows " +
    "group under a null stratum; empty-doc stratum keeps a null coverage") {
    val d = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("doc_id", "lang")
    val s = Seq(1L, 3L, 9L).toDF("vec_id") // 9 matches no document
    val out = Corpus.coverageAudit(d, "doc_id", "lang", s, "vec_id")
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(out(Some("en")) === ((2L, 1L, 0L, 0.5)))
    assert(out(Some("fr")) === ((1L, 1L, 0L, 1.0)))
    assert(out(None) === ((0L, 0L, 1L, -1.0)))
  }

  test("lmCountTable merges additively: table(a) ⊕ table(b) = " +
    "table(a ∪ b); scoring from the merged table equals direct training") {
    val a = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val b = Seq((3L, "a b"), (4L, "c c b")).toDF("doc_id", "text")
    val merged = Corpus.lmCountTable(a, "text")
      .unionByName(Corpus.lmCountTable(b, "text"))
      .groupBy(col("_u"), col("_v")).agg(sum(col("_c")).as("_c"))
    val whole = Corpus.lmCountTable(a.unionByName(b), "text")
    assert(merged.collect().map(_.toSeq).toSet ===
      whole.collect().map(_.toSeq).toSet)
    val score = Seq((10L, "a b z"), (11L, "c a")).toDF("doc_id", "text")
    val viaCounts = Corpus.lmScoreBackoffFromCounts(merged, score,
      "text", "doc_id").collect().map(_.toSeq).toSet
    val direct = Corpus.lmScoreBackoff(
      a.unionByName(b).unionByName(score).withColumn("_train",
        col("doc_id") < 10L),
      "text", "doc_id", trainPred = col("_train"))
      .filter(col("doc_id") >= 10L)
      .collect().map(_.toSeq).toSet
    assert(viaCounts === direct)
  }

  test("lmScoreBackoff: seen-bigram, backoff, and OOV paths on " +
    "hand-computed counts; zero-pair docs keep a null score") {
    // train (lang=en): c1 = {a:2, b:2, c:1}, T=5; c2 = {(a,b):2, (b,a):1,
    // (b,c):1}
    val d = Seq(
      (1L, "a b a b c", "en"),
      (2L, "a b c", "xx"),   // (a,b) seen: 1e6·2/2; (b,c) seen: 1e6·1/2
      (3L, "c a z", "xx"),   // (c,a) backoff: 1e6·2·2/(5·5); (a,z) OOV
      (4L, "q", "xx"),       // single token: no pairs
      (5L, null, "xx")       // null text: no pairs
    ).toDF("doc_id", "text", "lang")
    val out = Corpus.lmScoreBackoff(d, "text", "doc_id",
      trainPred = col("lang") === "en").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 5)
    val d2 = out(2L)
    assert(d2.getLong(1) === 2L && d2.getLong(2) === 0L &&
      d2.getLong(3) === 0L && d2.getLong(4) === 1500000L)
    assert(d2.getDouble(5) === 750000.0)
    val d3 = out(3L)
    // (c,a): unseen bigram, a in vocab → ⌊1e6·2·2/25⌋ = 160000, backoff;
    // (a,z): z OOV → 0
    assert(d3.getLong(1) === 2L && d3.getLong(2) === 1L &&
      d3.getLong(3) === 1L && d3.getLong(4) === 160000L)
    assert(d3.getDouble(5) === 80000.0)
    // the train doc scores itself: (a,b) 1e6, (b,a) 5e5, (a,b) 1e6,
    // (b,c) 5e5 → mass 3e6 over 4 pairs
    val d1 = out(1L)
    assert(d1.getLong(1) === 4L && d1.getLong(4) === 3000000L &&
      d1.getDouble(5) === 750000.0)
    // zero-pair docs: zeros + null score
    Seq(4L, 5L).foreach { id =>
      val r = out(id)
      assert(r.getLong(1) === 0L && r.getLong(4) === 0L && r.isNullAt(5))
    }
  }

  test("bernoulliByScore: p=1 always keeps, p=0 never, null score gives " +
    "null verdict, decision deterministic and salt-sensitive") {
    val d = Seq((1L, 1.0), (2L, 0.0), (3L, 2.5), (4L, -1.0))
      .toDF("doc_id", "score")
      .unionByName(Seq((5L, null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "score"))
    val out = Corpus.bernoulliByScore(d, "doc_id", "score").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Boolean]("keep")).map(_.booleanValue)).toMap
    assert(out(1L) === Some(true) && out(3L) === Some(true)) // clamp hi
    assert(out(2L) === Some(false) && out(4L) === Some(false)) // clamp lo
    assert(out(5L) === None)
    // deterministic across invocations; a different salt redraws
    val again = Corpus.bernoulliByScore(d, "doc_id", "score").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Boolean]("keep"))).toMap
    assert(again.view.mapValues(_.map(_.booleanValue)).toMap === out)
    // p=0.5 over many ids: acceptance rate near half, salt changes draws
    val many = spark.range(1, 2001).select(col("id").as("doc_id"),
      lit(0.5).as("score"))
    val kept = Corpus.bernoulliByScore(many, "doc_id", "score")
      .filter(col("keep")).count()
    assert(kept > 800 && kept < 1200)
    val keptB = Corpus.bernoulliByScore(many, "doc_id", "score", salt = "b")
      .filter(col("keep")).count()
    assert(keptB != kept) // overwhelmingly likely under a fresh draw
  }

  test("distributionDrift: exact TV masses, absent-side keys count as " +
    "drift, nulls excluded, shares sum to the TV distance") {
    val ref = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (5L, null.asInstanceOf[String])).toDF("id", "k")
    val cur = Seq((6L, "A"), (7L, "C")).toDF("id", "k")
    val out = Corpus.distributionDrift(ref, cur, "k").collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("c_ref"), r.getAs[Long]("c_cur"),
          r.getAs[Long]("drift_num"), r.getAs[Double]("drift_share"))).toMap
    // N_ref=4 (null excluded), N_cur=2
    assert(out("A") === ((3L, 1L, 2L, 0.125)))   // |3·2 − 1·4|
    assert(out("B") === ((1L, 0L, 2L, 0.125)))   // vanished category
    assert(out("C") === ((0L, 1L, 4L, 0.25)))    // new category
    assert(!out.contains(null))
    // Σ shares = TV distance = 0.5 for these disjoint-ish mixes
    assert(math.abs(out.values.map(_._4).sum - 0.5) < 1e-12)
  }

  test("temperatureShares: √T_s weights, null/empty strata excluded, " +
    "flattening upsamples the low-resource stratum") {
    val d = Seq(
      (1L, "en", 900L), (2L, "en", 700L),   // T_en = 1600 → w = 40
      (3L, "fr", 100L),                     // T_fr = 100  → w = 10
      (4L, null.asInstanceOf[String], 50L), // null stratum excluded
      (5L, "de", 0L)                        // zero-mass stratum excluded
    ).toDF("doc_id", "lang", "n_toks")
    val shares = Corpus.temperatureShares(d, "lang", "n_toks")
    assert(shares === Seq("en" -> 40.0, "fr" -> 10.0))
    // raw share of fr is 100/1700 ≈ 6%; flattened it's 10/50 = 20%
    val Seq((_, wEn), (_, wFr)) = shares
    assert(wFr / (wEn + wFr) > 100.0 / 1700.0)
  }

  test("repetitionPlan: exact integer targets, over-cap verdicts, deficit " +
    "tokens; unplanned strata ignored, planned-but-absent strata surface") {
    val d = Seq(
      (1L, "en", 600L), (2L, "en", 400L), // T_en = 1000
      (3L, "fr", 100L),                   // T_fr = 100
      (4L, "es", 999L)                    // unplanned → ignored
    ).toDF("doc_id", "lang", "n_toks")
    // W = 5; budget 2000 → en target 1200, fr 400, ja 400; cap 2 epochs
    val out = Corpus.repetitionPlan(d, "lang", "n_toks",
      Seq("en" -> 3L, "fr" -> 1L, "ja" -> 1L), // ja planned but absent
      budgetTokens = 2000L, capNum = 2L, capDen = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4), r.getLong(5))).toMap
    assert(out.keySet === Set("en", "fr", "ja"))
    assert(out("en") === ((1000L, 1200L, Some(1.2), false, 0L)))
    // fr: 400/100 = 4 epochs > cap 2 → deficit 400 − 200 = 200
    assert(out("fr") === ((100L, 400L, Some(4.0), true, 200L)))
    // planned stratum with no data: avail 0, epochs null, whole ask is deficit
    assert(out("ja") === ((0L, 400L, None, true, 400L)))
  }

  test("repetitionPlan: rejects non-positive weights, duplicates, and " +
    "overflow-prone budgets") {
    val d = Seq((1L, "en", 1L)).toDF("doc_id", "lang", "n_toks")
    intercept[IllegalArgumentException](Corpus.repetitionPlan(d, "lang",
      "n_toks", Seq("en" -> 0L), 10L, 1L, 1L))
    intercept[IllegalArgumentException](Corpus.repetitionPlan(d, "lang",
      "n_toks", Seq("en" -> 1L, "en" -> 2L), 10L, 1L, 1L))
    intercept[IllegalArgumentException](Corpus.repetitionPlan(d, "lang",
      "n_toks", Seq("en" -> 1000L), Long.MaxValue / 10L, 1L, 1L))
  }

  test("diversityPrune: near-dup of a better-ranked result drops, " +
    "one-step rule (no MMR rescue), dense re-rank, top-k cut") {
    val ranked = Seq(
      (100L, 1L, 10L, 1), (100L, 2L, 9L, 2), (100L, 3L, 8L, 3),
      (100L, 4L, 7L, 4),
      (200L, 2L, 5L, 1), (200L, 9L, 4L, 2)
    ).toDF("query_id", "doc_id", "rrf_score", "rank")
    // chain 1–2–3: 2 dominated by 1; 3 dominated by 2 EVEN THOUGH 2 drops
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Corpus.diversityPrune(ranked, pairs, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Int]("final_rank")).toMap
    assert(out === Map((100L, 1L) -> 1, (100L, 4L) -> 2,
      // query 200: doc 2 is rank 1 THERE — nothing better-ranked, stays
      (200L, 2L) -> 1, (200L, 9L) -> 2))
    // top-k cut applies after the prune
    val cut = Corpus.diversityPrune(ranked, pairs, k = 1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet
    assert(cut === Set((100L, 1L), (200L, 2L)))
  }

  test("ngramDiversity: exact distinct/total per order, partial tail " +
    "grams for short docs, orders share one pass") {
    val docs = Seq(
      ("en", "a a a a"),   // 1g: 4×a; 2g: 3×"a a"; 3g: 2×"a a a"
      ("en", "b c")        // 1g: b,c; 2g: "b c"; 3g: partial "b c"
    ).toDF("lang", "text")
    val out = Corpus.ngramDiversity(docs, "lang", "text", Seq(1, 2, 3))
      .collect().map(r => r.getAs[Int]("n") ->
        (r.getAs[Long]("distinct_ngrams"), r.getAs[Long]("total_ngrams"),
          r.getAs[Double]("distinct_ratio"))).toMap
    assert(out(1) === ((3L, 6L, 0.5)))
    assert(out(2) === ((2L, 4L, 0.5)))
    assert(out(3) === ((2L, 3L, 2.0 / 3.0)))
  }

  test("stopwordCoverage: head terms from the stratum's own vocabulary, " +
    "deterministic tie order, per-doc exact ratios") {
    val docs = Seq(
      (1L, "en", "the cat sat"),
      (2L, "en", "the the dog"),
      (3L, "en", "zz qq ww")
    ).toDF("doc_id", "lang", "text")
    // counts: the×3; cat/dog/sat/zz/qq/ww ×1 → top-2 = {the, cat} (tie→asc)
    val out = Corpus.stopwordCoverage(docs, "lang", "text", "doc_id", k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_stop"),
          r.getAs[Double]("stop_ratio"))).toMap
    assert(out(1L) === ((3L, 2L, 2.0 / 3.0)))
    assert(out(2L) === ((3L, 2L, 2.0 / 3.0)))
    assert(out(3L) === ((3L, 0L, 0.0)))
  }

  test("headCoverage: smallest head vocab per coverage fraction, exact " +
    "crossing, multiple strata in one pass") {
    // en: a×6 b×3 c×1 (tot 10): 50%→{a} covers 6; 90%→{a,b} covers 9
    // is NOT ≥ 9? 9*10 >= 9*10 ✓ so 90%→2 terms; 100%→3
    val docs = Seq(
      ("en", "a a a a a a b b b c"),
      ("fr", "x x y")
    ).toDF("lang", "text")
    val out = Corpus.headCoverage(docs, "lang", "text",
      Seq((1, 2), (9, 10), (1, 1))).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("frac")) ->
        (r.getAs[Long]("vocab_size"), r.getAs[Long]("covered_tokens"),
          r.getAs[Long]("total_tokens"))).toMap
    assert(out(("en", 0.5)) === ((1L, 6L, 10L)))
    assert(out(("en", 0.9)) === ((2L, 9L, 10L)))
    assert(out(("en", 1.0)) === ((3L, 10L, 10L)))
    // fr: x×2 y×1 (tot 3): 50% → x (2/3); 90% → 2 terms; 100% → 2
    assert(out(("fr", 0.5)) === ((1L, 2L, 3L)))
    assert(out(("fr", 0.9)) === ((2L, 3L, 3L)))
    assert(out(("fr", 1.0)) === ((2L, 3L, 3L)))
    // exactly one crossing row per (stratum, frac)
    assert(out.size === 6)
  }

  test("postingsTable: additive on disjoint batches; scoring against the " +
    "merged table equals direct bm25TopK") {
    val a = Seq((1L, "apple banana cherry"), (2L, "apple apple banana"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "durian cherry fig"), (4L, "cherry cherry apple"))
      .toDF("doc_id", "text")
    val docs = a.unionByName(b)
    val merged = Corpus.postingsTable(a, "text", "doc_id")
      .unionByName(Corpus.postingsTable(b, "text", "doc_id"))
    val whole = Corpus.postingsTable(docs, "text", "doc_id")
    assert(merged.collect().map(_.toSeq).toSet ===
      whole.collect().map(_.toSeq).toSet)
    val q = Seq((100L, "apple cherry")).toDF("doc_id", "text")
    val direct = Corpus.bm25TopK(docs, q, "text", "doc_id", "doc_id",
      "text", k = 10).collect().map(_.toSeq).toSet
    val viaTable = Corpus.bm25TopKAgainstPostings(q, merged, "doc_id",
      "text", k = 10).collect().map(_.toSeq).toSet
    assert(viaTable === direct)
  }

  test("rrfFuse: agreement across lists wins, n_lists counts votes, " +
    "ties break on doc id") {
    val l1 = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 11L, 1), (1L, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val out = Corpus.rrfFuse(Seq(l1, l2), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rrf_score"), r.getAs[Long]("n_lists"),
          r.getAs[Int]("rank"))).toMap
    def c(r: Int) = 1000000000L / (r + 60)
    // doc 11 appears in both lists: summed contributions, 2 votes, rank 1
    assert(out(11L) === ((c(2) + c(1), 2L, 1)))
    assert(out(10L)._2 === 1L && out(12L)._2 === 1L && out(13L)._2 === 1L)
    // single-vote docs rank below the double-vote doc; equal-score ties
    // (rank-1-only vs rank-1-only) would break on doc id — here 10 (c1)
    // beats 13 (c2) on score alone
    assert(out(10L)._3 === 2)
    assert(out(13L)._3 === 3 && out(12L)._3 === 4)
    // top-k cut honored
    val cut = Corpus.rrfFuse(Seq(l1, l2), k = 2).collect()
    assert(cut.length === 2)
  }

  test("leakageSafeSplit: cluster members share one split; singletons " +
    "keep their per-id assignment") {
    val docs = (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"))
    // two clusters: {1,2,3} (chained) and {7,8}; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = Corpus.leakageSafeSplit(docs, "doc_id", pairs, 0.25, 0.25)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("split_key"), r.getAs[String]("split"))).toMap
    // members inherit the min-id canonical as split key → same split
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(out(7L)._1 === 7L && out(8L)._1 === 7L)
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size === 1)
    assert(out(7L)._2 === out(8L)._2)
    // a singleton's assignment equals plain hashSplit on its own id
    val plain = Corpus.hashSplit(docs.filter(col("doc_id") === 5L),
      "doc_id", 0.25, 0.25).collect().head.getAs[String]("split")
    assert(out(5L) === ((5L, plain)))
    // every row is assigned something legal
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("splitRouteAgainst: corpus matches inherit the cluster's split " +
    "key; batch clusters close locally; singletons match leakageSafeSplit") {
    // single trailing-char differences keep shingle-7 Jaccard ≥ 4/5
    val tmpl = "large language models are trained on vast corpora of text " +
      "data scraped from across the public web %s"
    val corpus = Seq(
      (10L, tmpl.format("aa")), (11L, tmpl.format("ac")),
      (12L, "completely unrelated content about volcanoes and magnitudes")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, "text", "doc_id",
      k = 16, shingleLen = 7)
    val corpusPairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
      k = 16, bands = 4, shingleLen = 7, thNum = 4, thDen = 5)
      .select(col("doc_a"), col("doc_b"))
    val corpusKeys = corpus.select(col("doc_id"))
      .join(Dedup.dupClusters(corpusPairs)
        .withColumnRenamed("member_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("split_key"))
    // corpus 10/11 cluster under key 10
    assert(corpusKeys.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(10L -> 10L, 11L -> 10L, 12L -> 12L))
    val local = "a fresh document about exactly-once streaming watermark " +
      "semantics and state store compaction policies %s"
    val batch = Seq(
      (20L, tmpl.format("ab")),       // near-dup of corpus 10/11
      (21L, local.format("zz")),      // batch-internal near-dup pair
      (22L, local.format("zq")),
      (23L, "nothing like anything else in this corpus at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Corpus.splitRouteAgainst(batch, sigs, corpus, corpusKeys,
      "text", "doc_id", 0.25, 0.25, k = 16, bands = 4, shingleLen = 7,
      thNum = 4, thDen = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("split_key"), r.getAs[String]("split"))).toMap
    // 20 inherits the corpus cluster key 10
    assert(out(20L)._1 === 10L)
    // 21/22 are batch-internal near-dups: shared local key 21, same split
    assert(out(21L)._1 === 21L && out(22L)._1 === 21L)
    assert(out(21L)._2 === out(22L)._2)
    // 23 is a singleton: identical assignment to plain hashSplit
    assert(out(23L)._1 === 23L)
    val plain = Corpus.hashSplit(batch.filter(col("doc_id") === 23L),
      "doc_id", 0.25, 0.25).collect().head.getAs[String]("split")
    assert(out(23L)._2 === plain)
  }

  test("splitRouteAgainst: a batch doc matching TWO distinct corpus " +
    "clusters is flagged bridging and adopts the smaller key") {
    // Jaccard is not transitive: D = core, A = core+sufA, B = core+sufB.
    // sim(D,A) ≈ sim(D,B) ≈ |core|/(|core|+|suf|) ≥ 0.8 while
    // sim(A,B) ≈ |core|/(|core|+2|suf|) < 0.8 — so A and B sit in
    // DISTINCT corpus clusters and the batch doc D bridges them.
    val core = "the quick brown fox jumps over the lazy dog while " +
      "seventeen astronauts calibrate spectral instruments aboard the " +
      "orbital platform during routine maintenance windows every " +
      "alternate morning before dawn"
    val sufA = " and later they archived burnt clay"
    val sufB = " then quietly mapped frozen deltas"
    val corpus = Seq((10L, core + sufA), (13L, core + sufB))
      .toDF("doc_id", "text")
    val params = (16, 8, 7, 4, 5) // k, bands, shingleLen, thNum, thDen
    val (k, bands, sh, tn, td) = params
    // A and B must NOT be near-dups of each other under these params
    assert(Dedup.minhashNearDups(corpus, "text", "doc_id", k, bands, sh,
      tn, td).count() === 0L)
    val sigs = Dedup.minhashSignatures(corpus, "text", "doc_id", k, sh)
    val corpusKeys = Seq((10L, 10L), (13L, 13L)).toDF("doc_id", "split_key")
    val batch = Seq((20L, core)).toDF("doc_id", "text")
    // D really matches both corpus clusters
    val crossIds = Dedup.minhashNearDupsAgainstSigs(batch, sigs, corpus,
      "text", "doc_id", k, bands, sh, tn, td)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(crossIds === Set(10L, 13L))
    val out = Corpus.splitRouteAgainst(batch, sigs, corpus, corpusKeys,
      "text", "doc_id", 0.25, 0.25, k = k, bands = bands, shingleLen = sh,
      thNum = tn, thDen = td).collect()
    assert(out.length === 1)
    val row = out.head
    assert(row.getAs[Long]("split_key") === 10L)   // adopts the smaller key
    assert(row.getAs[Boolean]("bridging"))          // ...and is surfaced
  }

  test("ccnetBuckets: per-lang fluency terciles — head=most fluent, " +
    "equal-count boundaries, unscorable docs in a NULL bucket") {
    // en train slice: "a b" dominates, so docs repeating "a b" score
    // highest; doc 7 has one token (no pairs), doc 8 null text
    val docs = Seq(
      (1L, "a b a b a b a b", "en"), // all pairs high-prob
      (2L, "a b a b x y", "en"),     // mixed
      (3L, "x y z w q r", "en"),     // low-prob pairs
      (4L, "a b a b", "fr"),
      (5L, "x y z w", "fr"),
      (6L, "q r s t", "fr"),
      (7L, "solo", "en"),
      (8L, null.asInstanceOf[String], "fr")
    ).toDF("doc_id", "text", "lang")
    val out = Corpus.ccnetBuckets(docs, "text", "doc_id", "lang",
      trainPred = col("lang") === "en")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), Option(r.get(4)).map(_.toString)))
      .toMap
    // en terciles: 3 scored docs → one per bucket, ordered by score desc.
    // Scores (hand-checked): doc3 0.900 (its pairs are rare but ALWAYS
    // follow their head token — q = c2/c1 per pair), doc1 0.857 (the b→a
    // back-pairs dilute), doc2 0.767
    assert(out(3L)._3 === Some("head"))
    assert(out(1L)._3 === Some("middle"))
    assert(out(2L)._3 === Some("tail"))
    // fr docs scored by the SAME en-trained LM; 3 scored → 3 buckets
    assert(Seq(4L, 5L, 6L).flatMap(out(_)._3).toSet ===
      Set("head", "middle", "tail"))
    assert(out(4L)._3 === Some("head")) // "a b" pairs score highest
    // unscorable: no pairs / null text → NULL bucket, n_pairs 0
    assert(out(7L) === (("en", 0L, None)))
    assert(out(8L) === (("fr", 0L, None)))
    // deterministic: same input → same buckets
    val again = Corpus.ccnetBuckets(docs, "text", "doc_id", "lang",
      trainPred = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.toString)).toMap
    assert(again === out.map { case (k, v) => k -> v._3 })
  }

  test("ccnetThresholds/ccnetRoute: frozen-boundary routing reproduces " +
    "ccnetBuckets on the reference corpus; unroutable rows → NULL bucket") {
    val corpus = Seq(
      (1L, "a b a b a b a b", "en"), (2L, "a b a b x y", "en"),
      (3L, "x y z w q r", "en"),
      (4L, "a b a b", "fr"), (5L, "x y z w", "fr"), (6L, "q r s t", "fr")
    ).toDF("doc_id", "text", "lang")
    val pred = col("lang") === "en"
    val thr = Corpus.ccnetThresholds(corpus, "text", "doc_id", "lang", pred)
    // one boundary row per (lang, k): 2 langs × 2 boundaries
    val trows = thr.collect().map(r =>
      (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(trows.keySet === Set(("en", 1), ("en", 2), ("fr", 1), ("fr", 2)))
    // boundaries descend with k
    assert(trows(("en", 1)) >= trows(("en", 2)))
    val counts = Corpus.lmCountTable(corpus.filter(pred), "text")
    // invariant (distinct scores): routing the corpus against its own
    // frozen thresholds = ccnetBuckets' membership
    val routed = Corpus.ccnetRoute(corpus, counts, thr, "text", "doc_id",
        "lang").collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString)).toMap
    val direct = Corpus.ccnetBuckets(corpus, "text", "doc_id", "lang", pred)
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.toString)).toMap
    assert(routed === direct)
    // arrivals: a fluent en doc routes head; a language with no
    // threshold row and an unscorable doc both quarantine to NULL
    // doc 10 "a b": its one pair scores 1.0 > the en head boundary (0.9,
    // doc 3's score — rank-1 of 3). "a b a b a b" would score 0.867 and
    // route middle: the b→a back-pairs dilute below the boundary
    val batch = Seq((10L, "a b", "en"), (11L, "a b a b", "zz"),
      (12L, "solo", "en")).toDF("doc_id", "text", "lang")
    val out = Corpus.ccnetRoute(batch, counts, thr, "text", "doc_id", "lang")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString)).toMap
    assert(out(10L) === Some("head"))
    assert(out(11L) === None && out(12L) === None)
  }

  test("recloseSplitKeys: re-unifies the bridging case — post-reclose no " +
    "verified near-dup pair straddles splits, and output = leakageSafeSplit") {
    // same non-transitive fixture as the bridging spec: A(10) and B(13)
    // are distinct corpus clusters; the routed batch doc D(20) bridges
    val core = "the quick brown fox jumps over the lazy dog while " +
      "seventeen astronauts calibrate spectral instruments aboard the " +
      "orbital platform during routine maintenance windows every " +
      "alternate morning before dawn"
    val corpus = Seq((10L, core + " and later they archived burnt clay"),
      (13L, core + " then quietly mapped frozen deltas"),
      (14L, "entirely unrelated prose about tide tables and lighthouses"))
      .toDF("doc_id", "text")
    val (k, bands, sh, tn, td) = (16, 8, 7, 4, 5)
    val corpusSigs = Dedup.minhashSignatures(corpus, "text", "doc_id", k, sh)
    val corpusKeys = Seq((10L, 10L), (13L, 13L), (14L, 14L))
      .toDF("doc_id", "split_key")
    val batch = Seq((20L, core)).toDF("doc_id", "text")
    val routed = Corpus.splitRouteAgainst(batch, corpusSigs, corpus,
      corpusKeys, "text", "doc_id", 0.25, 0.25, k = k, bands = bands,
      shingleLen = sh, thNum = tn, thDen = td).collect().head
    assert(routed.getAs[Boolean]("bridging")) // the defect to repair
    // the maintained state after routing: union signature table
    val union = corpus.unionByName(batch)
    val sigs = corpusSigs.unionByName(
      Dedup.minhashSignatures(batch, "text", "doc_id", k, sh))
    val reclosed = Corpus.recloseSplitKeys(union, sigs, "text", "doc_id",
      0.25, 0.25, k = k, bands = bands, shingleLen = sh, thNum = tn,
      thDen = td)
    val out = reclosed.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("split_key"), r.getAs[String]("split"))).toMap
    // the bridged component {10, 13, 20} is ONE cluster under one key —
    // including the pair (13, 20) that routing had split apart
    assert(out(10L)._1 === 10L && out(13L)._1 === 10L && out(20L)._1 === 10L)
    assert(Set(out(10L)._2, out(13L)._2, out(20L)._2).size === 1)
    assert(out(14L)._1 === 14L) // untouched singleton
    // no verified near-dup pair straddles splits
    val pairs = Dedup.minhashNearDupsFromSigs(sigs, union, "text",
      "doc_id", k, bands, sh, tn, td).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      assert(out(p.getAs[Long]("doc_a"))._2 === out(p.getAs[Long]("doc_b"))._2)
    }
    // invariant: identical to leakageSafeSplit over the whole corpus
    val fresh = Corpus.leakageSafeSplit(union, "doc_id",
      Dedup.minhashNearDups(union, "text", "doc_id", k, bands, sh, tn, td)
        .select(col("doc_a"), col("doc_b")), 0.25, 0.25)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("split_key"), r.getAs[String]("split"))).toMap
    assert(out === fresh)
  }

  test("minhashNearDupsFromSigs: identical verified pairs to the " +
    "fresh-signature pipeline") {
    val tmpl = "large language models are trained on vast corpora of text " +
      "data scraped from across the public web %s"
    val docs = Seq((1L, tmpl.format("aa")), (2L, tmpl.format("ab")),
      (3L, "unrelated writing about glacial moraines and drumlins"),
      (4L, tmpl.format("ac"))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 16, 7)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val fromSigs = key(Dedup.minhashNearDupsFromSigs(sigs, docs, "text",
      "doc_id", 16, 4, 7, 4, 5))
    val fresh = key(Dedup.minhashNearDups(docs, "text", "doc_id",
      16, 4, 7, 4, 5))
    assert(fromSigs === fresh && fromSigs.nonEmpty)
  }

  test("numericDistributionDrift: exact-integer TV over fixed bins, " +
    "negative values floor correctly, NULLs excluded") {
    val ref = Seq(Option(-150.0), Option(-50.0), Option(50.0),
      Option(250.0), Option.empty[Double]).toDF("v")
    val cur = Seq(Option(50.0), Option(60.0)).toDF("v")
    val out = Corpus.numericDistributionDrift(ref, cur, "v", 100.0)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("c_ref"), r.getAs[Long]("c_cur"),
          r.getAs[Long]("drift_num"), r.getAs[Double]("drift_share"))).toMap
    // bins: -150 → -2 (floor, not truncate), -50 → -1, 50/60 → 0,
    // 250 → 2; the NULL never counts (nr = 4, nc = 2)
    assert(out.keySet === Set(-2L, -1L, 0L, 2L))
    assert(out(-2L) === ((1L, 0L, 2L, 0.125)))
    assert(out(-1L) === ((1L, 0L, 2L, 0.125)))
    assert(out(0L) === ((1L, 2L, 6L, 0.375)))
    assert(out(2L) === ((1L, 0L, 2L, 0.125)))
  }

  test("stratifiedSample: at most k per stratum, deterministic, md5-ordered") {
    val docs = (1L to 20L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val out = Corpus.stratifiedSample(docs, "lang", "doc_id", 3)
    val byLang = out.collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byLang("en").size === 3 && byLang("fr").size === 3)
    // reproducible: same input → same sample
    val again = Corpus.stratifiedSample(docs, "lang", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === out.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // matches the independent md5-order reimplementation
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val expectEn = (1L to 20L).filter(_ % 2 == 0).sortBy(i => (key(i), i)).take(3).toSet
    assert(byLang("en") === expectEn)
    // partition-layout-invariant: the per-partition prune must keep every
    // global survivor whatever partition its rows land in
    val spread = Corpus.stratifiedSample(docs.repartition(7), "lang", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(spread === out.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("strataCentroids: exact elementwise means, partitioning-invariant") {
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("doc_id", "lang")
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Corpus.strataCentroids(docs, "lang", "doc_id", emb, "vec_id", "embedding")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out === Map(("en", 0) -> 2.0, ("en", 1) -> 4.0,
      ("fr", 0) -> 5.0, ("fr", 1) -> 5.0))
    val repartitioned = Corpus.strataCentroids(docs, "lang", "doc_id",
      emb.repartition(5), "vec_id", "embedding")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(repartitioned === out)
  }

  test("topTermsPerStratum: exact counts, rank by count desc then term asc") {
    val docs = Seq(
      (1L, "en", "apple banana apple"),
      (2L, "en", "banana cherry  Apple"),  // normalize lowercases + squeezes
      (3L, "fr", "chat chien")
    ).toDF("doc_id", "lang", "text")
    val out = Corpus.topTermsPerStratum(docs, "lang", "text", 2)
      .orderBy("lang", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      ("en", "apple", 3L, 1), ("en", "banana", 2L, 2),
      ("fr", "chat", 1L, 1), ("fr", "chien", 1L, 2)))
  }

  test("quantileDisc: picks the group element at rank ⌈p·n⌉, never interpolates") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),           // n=4
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 5L) // n=5
    ).toDF("g", "v")
    val got = Corpus.quantileDisc(df, "g", "v", Seq(0.25, 0.5, 0.75, 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // DuckDB quantile_disc probe: n=4 → (1,2,3,4); n=5 → (2,3,4,5)
    assert(got("a") === ((1L, 2L, 3L, 4L)))
    assert(got("b") === ((2L, 3L, 4L, 5L)))
    val again = Corpus.quantileDisc(df.repartition(7), "g", "v",
      Seq(0.25, 0.5, 0.75, 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again === got)
  }

  test("bigramRepetition: top-bigram concentration and distinct-token ratio") {
    val docs = Seq(
      // bigrams: [ab, ba, ab, bc] → top "a b" ×2 of 4; distinct 3/5 tokens
      (1L, "a b a b c"),
      (2L, "x y z"),   // all bigrams unique → ratio 1/2, dtr 1.0
      (3L, "solo"),    // < 2 tokens → excluded
      (4L, "")         // tokenizes to [""] → excluded
    ).toDF("doc_id", "text")
    val got = Corpus.bigramRepetition(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((4L, 2L, 0.5, 0.6)))
    assert(got(2L) === ((2L, 1L, 0.5, 1.0)))
  }

  test("tokenBudgetSample: greedy md5-ordered fill, inclusive-≤ budget, " +
    "per-stratum isolation") {
    val docs = (1L to 10L).map(i =>
      (i, if (i % 2 == 0) "en" else "fr", 10)).toDF("doc_id", "lang", "n_toks")
    val out = Corpus.tokenBudgetSample(docs, "lang", "doc_id", "n_toks", 30L)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(3)))
    // 10 tokens per doc, budget 30 → exactly 3 docs per stratum
    assert(rows.count(_._2 == "en") === 3 && rows.count(_._2 == "fr") === 3)
    assert(rows.forall(_._3 <= 30L))
    // the kept set is the md5-order prefix — same order stratifiedSample pins
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val expectEn = (1L to 10L).filter(_ % 2 == 0).sortBy(i => (key(i), i)).take(3).toSet
    assert(rows.filter(_._2 == "en").map(_._1).toSet === expectEn)
    // a budget smaller than the first doc keeps nothing
    assert(Corpus.tokenBudgetSample(docs, "lang", "doc_id", "n_toks", 5L).count() === 0)
    // partition-layout-invariant: the local-prefix prune must never drop a
    // global keeper regardless of which partition each row lands in
    val spread = Corpus.tokenBudgetSample(docs.repartition(5), "lang",
      "doc_id", "n_toks", 30L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(spread === rows.map(r => (r._1, r._3)).toSet)
  }

  test("packSequences: md5-ordered exclusive prefix offsets, exact " +
    "sequence/position assignment, partition-layout-invariant") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "en" else "fr", (i % 7 + 1).toInt))
      .toDF("doc_id", "lang", "n_toks")
    val got = Corpus.packSequences(docs, "lang", "doc_id", "n_toks", 10L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tok_offset"), r.getAs[Long]("seq_idx"),
          r.getAs[Long]("seq_pos"))).toMap
    // by-hand reference: md5-order concat per stratum, exclusive cum
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val expect = (1L to 40L).groupBy(i => i % 2).flatMap { case (_, ids) =>
      ids.sortBy(i => (key(i), i))
        .scanLeft((0L, 0L)) { case ((cum, _), i) => (cum + (i % 7 + 1), i) }
        // sliding pairs (cum through previous doc, this id): the exclusive
        // offset of each id
        .sliding(2).collect { case Seq((cum, _), (_, i)) => i -> cum }
    }.toMap
    assert(got.view.mapValues(_._1).toMap === expect)
    got.foreach { case (_, (off, idx, pos)) =>
      assert(idx === off / 10 && pos === off % 10)
    }
    // layout-invariant: same offsets from any input partitioning
    val again = Corpus.packSequences(docs.repartition(7), "lang", "doc_id",
      "n_toks", 10L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("tok_offset")).toMap
    assert(again === expect)
    // offsets are a gapless concatenation: per stratum, sorted offsets
    // equal the exclusive prefix sums of the sorted-order token counts
    val en = got.filter(_._1 % 2 == 0).values.map(_._1).toSeq.sorted
    assert(en.head === 0L && en.size === 20)
  }

  test("gopherQualityFilter: each rule drops its planted offender, " +
    "clean doc keeps") {
    val longEnough = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"the of $longEnough"),               // clean: 62 tokens, 2 stop hits
      (2L, "the of too short"),                  // min-tokens rule
      (3L, ((1 to 60).map(i => s"word$i") :+ "the" :+ "of").mkString(" ")),
      (4L, s"$longEnough $longEnough"),          // no stopwords → stop_hits 0
      (5L, "the of " + "spam " * 60)             // repetition: dtr + top bigram
    ).toDF("doc_id", "text")
    val got = Corpus.gopherQualityFilter(docs, "text", "doc_id", minTokens = 20)
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> false))
    // signals are emitted for the audit trail, not just the verdict
    val sig = Corpus.gopherQualityFilter(docs, "text", "doc_id", minTokens = 20)
      .filter(col("doc_id") === 5L).collect().head
    assert(sig.getInt(4) === 2)                  // stop_hits exact integer
    assert(sig.getDouble(6) > 0.18)              // top_bigram_ratio flags spam
  }

  test("quantileCont: linear-interpolation quantiles match the by-hand formula") {
    // odd group (exact middle), even group (interpolated), singleton group
    val df = Seq(
      ("a", 10.0), ("a", 30.0), ("a", 20.0), ("a", 50.0), ("a", 40.0),
      ("b", 1.0), ("b", 2.0), ("b", 4.0), ("b", 8.0),
      ("c", 7.5)
    ).toDF("g", "v")
    val got = Corpus.quantileCont(df, "g", "v", Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    def q(s: Seq[Double], p: Double): Double = {
      val h = (s.size - 1) * p
      val lo = math.floor(h).toInt
      val fr = h - lo
      (1.0 - fr) * s(lo) + fr * s(math.min(lo + 1, s.size - 1))
    }
    val a = Seq(10.0, 20.0, 30.0, 40.0, 50.0)
    val b = Seq(1.0, 2.0, 4.0, 8.0)
    assert(got("a") === ((q(a, 0.25), q(a, 0.5), q(a, 0.9))))
    assert(got("b") === ((q(b, 0.25), q(b, 0.5), q(b, 0.9))))
    assert(got("c") === ((7.5, 7.5, 7.5)))
    // partitioning-invariant: repartitioned input → identical bits
    val again = Corpus.quantileCont(df.repartition(7), "g", "v", Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(again === got)
  }

  test("quantiles ignore NULL values; an all-null group keeps a null row") {
    val df = Seq(
      ("a", Some(2.0)), ("a", None), ("a", Some(1.0)), ("a", Some(3.0)),
      ("b", None), ("b", None)
    ).toDF("g", "v")
    // nulls neither rank nor count: group a is (1,2,3), n=3
    val cont = Corpus.quantileCont(df, "g", "v", Seq(0.5)).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(cont === Map("a" -> Some(2.0), "b" -> None))
    val disc = Corpus.quantileDisc(df, "g", "v", Seq(0.5)).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(disc === Map("a" -> Some(2.0), "b" -> None))
  }

  test("Ranks.byValue: a single group spans >1 range partition, ranks global") {
    // 2 groups × 10k rows — the 100×-scale hazard the two-pass rank removes
    // is one-reducer-per-group; assert each group's rows actually spread
    // over multiple range partitions, and that ranks still form the exact
    // global 1..n sequence per group with value order preserved
    val df = spark.range(0, 20000)
      .select((col("id") % 2).cast("string").as("g"),
        ((col("id") * 2654435761L) % 99991).cast("double").as("_v"))
    val ranked = Ranks.byValue(df, "g", finish = identity, eager = false)
    val spread = ranked.groupBy("g")
      .agg(countDistinct(col("_pid")).as("np"), count(lit(1)).as("n"),
        max(col("_rn")).as("maxrn"), min(col("_rn")).as("minrn"),
        countDistinct(col("_rn")).as("nrn"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    spread.foreach { case (np, n, maxrn, minrn, nrn) =>
      assert(np > 1, "group confined to one range partition")
      assert(minrn === 1L && maxrn === n && nrn === n,
        "ranks must be the exact 1..n permutation per group")
    }
    // rank order must agree with value order: sort by rank == sort by value
    val byRank = ranked.filter(col("g") === "0").orderBy("_rn")
      .select("_v").collect().map(_.getDouble(0))
    assert(byRank.toSeq === byRank.sorted.toSeq)
  }

  test("mixtureSample: B = min ⌊T/w⌋, per-stratum ⌊w·B⌋ quotas, md5-order " +
    "fill, non-target strata excluded") {
    val docs = Seq(
      (1L, "en", 10), (2L, "en", 10), (3L, "en", 10),  // T=30, w=.5 → 60
      (4L, "fr", 10), (5L, "fr", 10),                  // T=20, w=.2 → 100
      (6L, "de", 12),                                  // T=12, w=.3 → 40 = B
      (7L, "zh", 99)                                   // not in shares
    ).toDF("doc_id", "lang", "n_toks")
    val out = Corpus.mixtureSample(docs, "lang", "doc_id", "n_toks",
      Seq("en" -> 0.5, "fr" -> 0.2, "de" -> 0.3))
      .collect().map(r => (r.getLong(1), r.getString(0), r.getLong(3)))
      .sortBy(_._1)
    // quotas: en ⌊.5·40⌋=20 → first 2 en docs by md5 order; fr ⌊.2·40⌋=8
    // < 10 → none fit; de ⌊.3·40⌋=12 → doc 6 exactly; zh excluded
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val enOrder = Seq(1L, 2L, 3L).sortBy(i => (key(i), i))
    assert(out.map(_._1).toSet === Set(enOrder(0), enOrder(1), 6L))
    assert(out.find(_._1 == 6L).get._3 === 12L)
    // cum_tokens follows the md5 order within en
    val enRows = out.filter(_._2 == "en").sortBy(_._3).map(_._1)
    assert(enRows.toSeq === enOrder.take(2))
  }

  test("corpusDiff: added/removed/changed by fingerprint, unchanged absent") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val after = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val out = Corpus.corpusDiff(before, after, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("hashSplit: matches the independent md5-slice computation, stable " +
    "under corpus growth, exact thresholds") {
    val docs = (1L to 200L).toDF("doc_id")
    val out = Corpus.hashSplit(docs, "doc_id", valFrac = 0.1, testFrac = 0.1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent reimplementation: first 32 bits of md5("split|<id>")
    val md = java.security.MessageDigest.getInstance("MD5")
    def slice(i: Long): Long =
      java.lang.Long.parseLong(
        md.digest(s"split|$i".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    val tVal = math.floor(0.1 * 4294967296.0).toLong
    val tTest = math.floor(0.2 * 4294967296.0).toLong
    (1L to 200L).foreach { i =>
      val expect = if (slice(i) < tVal) "val"
        else if (slice(i) < tTest) "test" else "train"
      assert(out(i) === expect, s"doc $i")
    }
    assert(out.values.toSet === Set("train", "val", "test"))
    // growth stability: the same doc keeps its split in a larger corpus
    val grown = Corpus.hashSplit((1L to 400L).toDF("doc_id"), "doc_id", 0.1, 0.1)
      .filter(col("doc_id") <= 200L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grown === out)
  }

  test("tokenRarity: exact corpus-frequency stats per doc") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Corpus.tokenRarity(docs, "text", "doc_id", rareMax = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    // counts: a→2, b→2, c→1
    assert(out.toSeq === Seq(
      (1L, 3L, 6L, 2.0, 0L, 0.0),      // a(2)+a(2)+b(2)
      (2L, 2L, 3L, 1.5, 1L, 0.5)))     // b(2)+c(1); c is rare
  }

  test("termCountTable merges additively: table(a) ⊕ table(b) = table(a ∪ b); " +
    "incremental scoring treats unseen tokens as maximally rare") {
    val a = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val b = Seq((3L, "z z w")).toDF("doc_id", "text")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = toMap(Corpus.mergeTermCounts(
      Corpus.termCountTable(a, "text"), Corpus.termCountTable(b, "text")))
    assert(merged === toMap(Corpus.termCountTable(a.unionByName(b), "text")))
    assert(merged === Map("x" -> 2L, "y" -> 2L, "z" -> 3L, "w" -> 1L))
    // batch with a token the table has never seen: c = 0 → rare
    val batch = Seq((9L, "x q")).toDF("doc_id", "text")
    val out = Corpus.tokenRarityAgainstTable(batch,
        Corpus.termCountTable(a, "text"), "text", "doc_id", rareMax = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4))).head
    // x→2, q→0: n_toks 2, sum_tf 2, n_rare 1 (q only; x has c=2 > 1)
    assert(out === ((2L, 2L, 1L)))
  }

  test("tfidfTopTerms: raw-idf scoring, term tie-break, k cap") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(docs, "text", "doc_id", k = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // N=2; doc1: a 2·2/1=4 beats b 1·2/2=1; doc2: c 1·2/1=2 beats b 1
    assert(out.toSeq === Seq((1L, "a", 2L, 1L, 4.0), (2L, "c", 1L, 1L, 2.0)))
    // k=2 returns both terms for doc 2, score-desc then term order
    val k2 = Corpus.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .filter(col("doc_id") === 2L).orderBy(col("score").desc)
      .collect().map(_.getString(1))
    assert(k2.toSeq === Seq("c", "b"))
  }

  test("shardAssign: serpentine fill balances weight, deterministic, " +
    "partition-invariant") {
    val docs = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4), (5L, 5))
      .toDF("doc_id", "n_toks")
    val out = Corpus.shardAssign(docs, "doc_id", "n_toks", nShards = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3))).toMap
    // weight-desc order 5,4,3,2,1 → p=0..4 → serpentine 0,1,1,0,0
    assert(out === Map(5L -> (0, 0L), 4L -> (1, 0L), 3L -> (1, 1L),
      2L -> (0, 1L), 1L -> (0, 2L)))
    val spread = Corpus.shardAssign(docs.repartition(5), "doc_id", "n_toks", 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3))).toMap
    assert(spread === out)
  }

  test("topFractionByMetric: exact ceil(q·n) kept per stratum, ties by id, " +
    "nulls dropped") {
    val df = Seq(
      ("en", 1L, 0.1), ("en", 2L, 0.2), ("en", 3L, 0.3), ("en", 4L, 0.4),
      ("fr", 5L, 0.5), ("fr", 6L, 0.5), ("fr", 7L, 0.5)
    ).toDF("lang", "doc_id", "m")
    val out = Corpus.topFractionByMetric(df, "lang", "doc_id", "m", q = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // en: n=4, keep 2 best → docs 3,4; fr: n=3 all tied at 0.5, keep
    // ceil(1.5)=2 — the id tie-break keeps the LAST two ids (6,7)
    assert(out.toSeq === Seq(("en", 3L, 0.75), ("en", 4L, 1.0),
      ("fr", 6L, 2.0 / 3.0), ("fr", 7L, 1.0)))
    val withNull = df.withColumn("m",
      when(col("doc_id") === 4L, lit(null)).otherwise(col("m")))
    val kept = Corpus.topFractionByMetric(withNull, "lang", "doc_id", "m", 0.5)
      .filter(col("lang") === "en").collect().map(_.getLong(1)).toSet
    // doc 4's null metric drops BEFORE ranking: n=3, keep ceil(1.5)=2
    assert(kept === Set(2L, 3L))
  }

  test("corpusStatsTable merges additively: merge(table(a), table(b)) = " +
    "table(a ∪ b); null text counts the doc but 0 chars/tokens") {
    val docs = Seq(
      (1L, "en", "s1", "one two three"), (2L, "en", "s1", "four"),
      (3L, "fr", "s2", null.asInstanceOf[String]),
      (4L, "fr", "s2", ""), (5L, "en", "s2", "five six")
    ).toDF("doc_id", "lang", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val whole = rows(Corpus.corpusStatsTable(docs, "lang", "source", "text"))
    val a = Corpus.corpusStatsTable(docs.filter(col("doc_id") <= 2), "lang", "source", "text")
    val b = Corpus.corpusStatsTable(docs.filter(col("doc_id") > 2), "lang", "source", "text")
    assert(rows(Corpus.mergeCorpusStats(a, b)) === whole)
    assert(rows(Corpus.mergeCorpusStats(b, a)) === whole) // commutative
    assert(whole.contains(("fr", "s2", 2L, 0L, 0L)))      // null+empty text
    assert(whole.contains(("en", "s1", 2L, 17L, 4L)))
  }

  test("sourceReputationFilter: per-source stats attached, verdict on " +
    "minDocs + short fraction, null source forms its own group") {
    val docs = Seq(
      (1L, "a b c d e", "good"), (2L, "f g h i j", "good"),
      (3L, "k l m n o", "good"),                       // good: 0/3 short
      (4L, "x", "spammy"), (5L, "y", "spammy"),
      (6L, "long enough text here", "spammy"),         // spammy: 2/3 short
      (7L, "solo doc with words", "tiny"),             // tiny: n=1 < minDocs
      (8L, null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("doc_id", "text", "source")
    val out = Corpus.sourceReputationFilter(docs, "source", "text", "doc_id",
      minDocs = 2L, shortToks = 3, maxShortFrac = 0.5)
    assert(out.count() === 8L) // verdict, not filter: every doc comes back
    val byId = out.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("src_n_docs"), r.getAs[Double]("src_short_frac"),
          r.getAs[Boolean]("src_keep"))).toMap
    assert(byId(1L) === ((3L, 0.0, true)))
    assert(byId(4L) === ((3L, 2.0 / 3.0, false))) // too short too often
    assert(byId(7L) === ((1L, 0.0, false)))       // below minDocs
    // null source: its own group (null-safe join), null text counts short
    assert(byId(8L) === ((1L, 1.0, false)))
  }

  test("bpePairCounts: exact adjacent-pair counts, deterministic tie " +
    "order, short tokens ignored, TakeOrdered plan") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "abab cd a"),   // abab → ab, ba, ab; cd → cd; "a" too short
      (2L, "abc X")        // abc → ab, bc; X too short
    ).toDF("doc_id", "text")
    val top = Corpus.bpePairCounts(docs, "text", topK = 3)
    // counts: ab=3, ba=1, cd=1, bc=1 — top3 ties break ascending by pair
    assert(top.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("ab", 3L), ("ba", 1L), ("bc", 1L)))
    // the top-K must plan as a per-partition heap merge, not a global sort
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    // partition-invariant
    assert(Corpus.bpePairCounts(docs.repartition(5), "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("ab", 3L), ("ba", 1L), ("bc", 1L)))
  }

  test("collocations: a planted multiword expression outranks frequent " +
    "unigram co-occurrence; exact lift; bigrams never cross docs") {
    import org.apache.spark.sql.functions.col
    // "new york" always together (perfect collocation); "the cat" co-occur
    // but 'the' is everywhere, diluting its lift
    val docs = Seq(
      (1L, "new york is where the cat sleeps the most"),
      (2L, "new york has the cat and the dog"),
      (3L, "the dog likes new york in the winter"),
      (4L, "a final doc mentioning new york and the end")
    ).toDF("doc_id", "text")
    val out = Corpus.collocations(docs, "text", minCount = 2L, topK = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val n = 34L   // total tokens (9 + 8 + 8 + 9)
    val (cab, ca, cb, lift) = out("new york")
    assert((cab, ca, cb) === ((4L, 4L, 4L)))
    assert(lift === (4L * n).toDouble / (4L * 4L))
    // "new york" (every occurrence paired) outranks "the cat"
    assert(lift > out("the cat")._4)
    // doc-boundary check: "most new" (doc 1 tail → doc 2 head) never forms
    assert(!out.contains("most new"))
  }

  test("oovRateAgainstTable: vocab = top-V by (count desc, term asc); " +
    "unseen tokens are OOV; exact rates") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "aa aa aa bb bb cc")    // counts: aa=3, bb=2, cc=1
    ).toDF("doc_id", "text")
    val counts = Corpus.termCountTable(corpus, "text")
    // V=2 → vocab {aa, bb}; cc (in table, below cut) and dd (unseen) OOV
    val got = Corpus.oovRateAgainstTable(
      Seq((10L, "aa bb cc dd"), (11L, "aa aa")).toDF("doc_id", "text"),
      counts, "text", "doc_id", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map(10L -> (4L, 2L, 0.5), 11L -> (2L, 0L, 0.0)))
    // tie at the boundary: bb=2 vs bz=2 — term asc keeps bb, drops bz
    val counts2 = Corpus.termCountTable(
      Seq((1L, "aa aa aa bb bb bz bz")).toDF("doc_id", "text"), "text")
    val tied = Corpus.oovRateAgainstTable(
      Seq((10L, "bb bz")).toDF("doc_id", "text"),
      counts2, "text", "doc_id", vocabSize = 2)
      .collect().head
    assert((tied.getLong(1), tied.getLong(2)) === ((2L, 1L)))
  }

  test("zorderLayout: bit interleave, cell bounds, curve-range shards, " +
      "null propagation, partition invariance") {
    // 4 corners + center of a [0,300]×[0,3000] box at bits=2 (cells 0-3):
    // widths: x (300>>2)+1 = 76, y (3000>>2)+1 = 751
    val rows = Seq(
      (1L, 0L, 0L),        // cells (0,0) → z 0
      (2L, 300L, 0L),      // cells (3,0) → interleave(11, 00) = 0b0101 = 5
      (3L, 0L, 3000L),     // cells (0,3) → 0b1010 = 10
      (4L, 300L, 3000L),   // cells (3,3) → 0b1111 = 15
      (5L, 150L, 1500L),   // cells (1,1) → 0b0011 = 3
      (6L, 76L, 751L))     // cells (1,1) → 3 (width boundary)
      .toDF("id", "x", "y")
    val out = Corpus.zorderLayout(rows, "id", "x", "y", bits = 2, nShards = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out === Map(
      1L -> (0L, 0L, 0L, 0), 2L -> (3L, 0L, 5L, 1), 3L -> (0L, 3L, 10L, 2),
      4L -> (3L, 3L, 15L, 3), 5L -> (1L, 1L, 3L, 0), 6L -> (1L, 1L, 3L, 0)))
    // nulls propagate, never cluster
    val withNull = Corpus.zorderLayout(
      Seq((1L, Some(5L), Some(9L)), (2L, None, Some(3L)))
        .toDF("id", "x", "y"), "id", "x", "y", bits = 2, nShards = 4)
      .orderBy("id").collect()
    assert(withNull(1).isNullAt(1) && withNull(1).isNullAt(3) &&
      withNull(1).isNullAt(4))
    // degenerate range (min = max) → cell 0 everywhere, and the layout
    // is partitioning-invariant
    val flat = Seq((1L, 7L, 1L), (2L, 7L, 2L)).toDF("id", "x", "y")
    assert(Corpus.zorderLayout(flat.repartition(3), "id", "x", "y")
      .collect().map(_.getLong(1)).toSet === Set(0L))
    // a range NARROWER than 2^bits scales UP to the full cell domain
    // (v·(2^bits−1) div range) — without this the narrow dimension's high
    // cell bits stay zero and the curve degenerates to a 1-D sort on the
    // wide dimension: x ∈ {0,1,2} at bits=2 spreads to cells {0,1,3}
    val narrow = Seq((1L, 0L, 5L), (2L, 1L, 5L), (3L, 2L, 5L))
      .toDF("id", "x", "y")
    val nout = Corpus.zorderLayout(narrow, "id", "x", "y", bits = 2,
      nShards = 4).orderBy("id").collect()
    assert(nout.map(_.getLong(1)).toSeq === Seq(0L, 1L, 3L))
    assert(nout.map(_.getLong(3)).toSeq === Seq(0L, 1L, 5L))
  }

  test("zorderLayoutAgainst: frozen frame reproduces the full layout, " +
      "out-of-frame arrivals clamp to edge cells, nulls still propagate") {
    val corpus = Seq((1L, 0L, 0L), (2L, 300L, 3000L), (3L, 150L, 1500L))
      .toDF("id", "x", "y")
    val bounds = corpus.agg(
      min(col("x")).as("_xmin"), max(col("x")).as("_xmax"),
      min(col("y")).as("_ymin"), max(col("y")).as("_ymax"))
    // same frame → same assignment as the batch-self layout over corpus
    val self = Corpus.zorderLayout(corpus, "id", "x", "y", bits = 2,
      nShards = 4).orderBy("id").collect().toSeq
    val against = Corpus.zorderLayoutAgainst(corpus, bounds, "id", "x",
      "y", bits = 2, nShards = 4).orderBy("id").collect().toSeq
    assert(self === against)
    // arrivals beyond the frozen frame clamp to the boundary cells
    val batch = Seq((10L, Some(-50L), Some(9999L)),
      (11L, Option.empty[Long], Some(5L))).toDF("id", "x", "y")
    val out = Corpus.zorderLayoutAgainst(batch, bounds, "id", "x", "y",
      bits = 2, nShards = 4).orderBy("id").collect()
    // x=-50 clamps to xmin → cell 0; y=9999 clamps to ymax → cell 3
    assert((out(0).getLong(1), out(0).getLong(2)) === ((0L, 3L)))
    assert(out(1).isNullAt(1) && out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("zorderLayoutN: 3-d interleave puts dim j's bit i at position " +
      "3i+j; D=2 reproduces the 2-d layout; wrapped span fails fast") {
    // cube corners at bits=2 over [0,300]×[0,3000]×[0,30] — widths
    // 76 / 751 / 8 (the x/y fixtures of the 2-d test + a third dim)
    val rows = Seq(
      (1L, 0L, 0L, 0L),       // cells (0,0,0) → z 0
      (2L, 300L, 0L, 0L),     // (3,0,0): x bits at 0,3 → z 0b001001 = 9
      (3L, 0L, 3000L, 0L),    // (0,3,0): y bits at 1,4 → z 0b010010 = 18
      (4L, 0L, 0L, 30L),      // (0,0,3): w bits at 2,5 → z 0b100100 = 36
      (5L, 300L, 3000L, 30L)) // (3,3,3) → z 63
      .toDF("id", "x", "y", "w")
    val out = Corpus.zorderLayoutN(rows, "id", Seq("x", "y", "w"),
      bits = 2, nShards = 8).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getInt(5))).toSeq === Seq(
      (1L, 0L, 0L, 0L, 0L, 0), (2L, 3L, 0L, 0L, 9L, 1),
      (3L, 0L, 3L, 0L, 18L, 2), (4L, 0L, 0L, 3L, 36L, 4),
      (5L, 3L, 3L, 3L, 63L, 7)))
    // cell column naming: cell_<dim>
    assert(Corpus.zorderLayoutN(rows, "id", Seq("x", "y", "w"), bits = 2,
      nShards = 8).columns.toSeq ===
      Seq("id", "cell_x", "cell_y", "cell_w", "zvalue", "shard"))
    // D=2 through the N-dim core = the 2-d layout exactly (the 2-d path
    // now delegates; this pins the interleave convention)
    val rows2 = Seq((1L, 0L, 0L), (2L, 300L, 3000L), (3L, 150L, 1500L))
      .toDF("id", "x", "y")
    val via2 = Corpus.zorderLayout(rows2, "id", "x", "y", bits = 2,
      nShards = 4).orderBy("id").collect().toSeq
    val viaN = Corpus.zorderLayoutN(rows2, "id", Seq("x", "y"), bits = 2,
      nShards = 4).orderBy("id").collect().toSeq
    assert(via2.map(r => (r.getLong(3), r.getInt(4))) ===
      viaN.map(r => (r.getLong(3), r.getInt(4))))
    // a dimension spanning more than the signed-long range wraps hi−lo
    // negative → raise_error, not silent engine-divergent arithmetic
    val wrapped = Seq((1L, Long.MinValue + 1, 0L),
      (2L, Long.MaxValue - 1, 1L)).toDF("id", "x", "y")
    val ex = intercept[Exception] {
      Corpus.zorderLayoutN(wrapped, "id", Seq("x", "y"), bits = 2,
        nShards = 4).collect()
    }
    assert(ex.getMessage != null)
  }

  test("zorderLayoutN with a STRING dimension: the dictionary-rank " +
      "embedding equals the hand-ranked long layout; a frozen dict " +
      "routes unknown values to NULL shard; all-NULL bounds propagate " +
      "NULL instead of misfiring the wrap error") {
    val docs = Seq((1L, "de", 0L), (2L, "en", 100L), (3L, "es", 200L),
      (4L, "fr", 300L), (5L, "zh", 400L), (6L, "en", 400L))
      .toDF("id", "lang", "n")
    val viaStr = Corpus.zorderLayoutN(docs, "id", Seq("lang", "n"),
      bits = 2, nShards = 4).orderBy("id").collect()
    // hand-ranked embedding: de→0, en→1, es→2, fr→3, zh→4
    val ranked = Seq((1L, 0L, 0L), (2L, 1L, 100L), (3L, 2L, 200L),
      (4L, 3L, 300L), (5L, 4L, 400L), (6L, 1L, 400L))
      .toDF("id", "lang", "n")
    val viaLong = Corpus.zorderLayoutN(ranked, "id", Seq("lang", "n"),
      bits = 2, nShards = 4).orderBy("id").collect()
    assert(viaStr.map(r => (r.getAs[Long]("zvalue"),
      r.getAs[Int]("shard"))).toSeq ===
      viaLong.map(r => (r.getAs[Long]("zvalue"),
        r.getAs[Int]("shard"))).toSeq)
    // the dict itself: binary-ordered dense ranks 0..n−1
    val dict = Corpus.stringDimDict(docs, "lang")
    assert(dict.orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("de", 0L), ("en", 1L), ("es", 2L), ("fr", 3L), ("zh", 4L)))
    // frozen frame + dict: a known value routes exactly as the corpus
    // layout did; an UNSEEN string has no position in a frozen
    // lexicographic frame → NULL shard (the unroutable-row contract)
    val bounds = Seq((0L, 4L, 0L, 400L))
      .toDF("_min_lang", "_max_lang", "_min_n", "_max_n")
    val batch = Seq((7L, "it", 50L), (8L, "es", 200L))
      .toDF("id", "lang", "n")
    val out = Corpus.zorderLayoutAgainstN(batch, bounds, "id",
        Seq("lang", "n"), bits = 2, nShards = 4,
        dicts = Map("lang" -> dict))
      .orderBy("id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("shard")))
    assert(out(1).getAs[Int]("shard") ===
      viaStr(2).getAs[Int]("shard"))
    // all-NULL dimension: bounds aggregate to NULL → NULL cells/shard,
    // NOT the wrapped-span raise_error (the round-14 advice case)
    val nulls = Seq((1L, Option.empty[Long], 5L),
      (2L, Option.empty[Long], 7L)).toDF("id", "x", "y")
    val outN = Corpus.zorderLayoutN(nulls, "id", Seq("x", "y"),
      bits = 2, nShards = 4).orderBy("id").collect()
    assert(outN.forall(r => r.isNullAt(r.fieldIndex("shard"))))
  }

  test("shardStats: per-shard row count, min/max, exact shard-local NDV") {
    val df = Seq((0, 10L, 100L), (0, 10L, 200L), (0, 30L, 100L),
      (1, 5L, 900L)).toDF("shard", "a", "b")
    val got = Corpus.shardStats(df, "shard", Seq("a", "b"))
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // (shard, n_rows, a_min, a_max, a_ndv, b_min, b_max, b_ndv)
    assert(got === Seq((0, 3L, 10L, 30L, 2L, 100L, 200L, 2L),
      (1, 1L, 5L, 5L, 1L, 900L, 900L, 1L)))
  }

  test("shardStatsSketch + mergeShardStats: merge(sketch(A), sketch(B)) " +
      "= sketch(A ∪ B) exactly, incl. bottom-k truncation and one-side " +
      "shards") {
    // shard 0: 20 distinct keys split across the sides (k=4 forces real
    // truncation on both sides AND the union); shard 1: A-only; shard 2:
    // B-only — the one-side pass-through legs
    val aRows = ((1L to 12L).map(v => (0, v)) :+ ((1, 100L))).toDF("sh", "v")
    val bRows = ((9L to 20L).map(v => (0, v)) :+ ((2, 200L))).toDF("sh", "v")
    val k = 4
    val direct = Corpus.shardStatsSketch(aRows.unionByName(bRows), "sh",
      Seq("v"), k).orderBy("sh").collect()
    val merged = Corpus.mergeShardStats(
      Corpus.shardStatsSketch(aRows, "sh", Seq("v"), k),
      Corpus.shardStatsSketch(bRows, "sh", Seq("v"), k),
      "sh", Seq("v"), k).orderBy("sh").collect()
    assert(merged.length === direct.length)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getInt(0) === d.getInt(0))
      assert(m.getAs[Long]("v_min") === d.getAs[Long]("v_min"))
      assert(m.getAs[Long]("v_max") === d.getAs[Long]("v_max"))
      assert(m.getSeq[Long](m.fieldIndex("v_kmv")).toSeq ===
        d.getSeq[Long](d.fieldIndex("v_kmv")).toSeq)
    }
    // n_rows: union counts (9..12 overlap is rows, not distinct — 13+13)
    assert(merged.find(_.getInt(0) === 0).get.getAs[Long]("n_rows") ===
      direct.find(_.getInt(0) === 0).get.getAs[Long]("n_rows"))
    assert(merged.map(_.getAs[Long]("n_rows")).sum === 26L)
  }

  test("bloomShardIndex: no false negatives, absent key yields fp-only " +
      "candidates, index rows = shards") {
    val df = Seq((0, 1L), (0, 2L), (0, 1L), (1, 3L), (1, 4L), (2, 1L))
      .toDF("shard", "k")
    val (index, report) = Corpus.bloomShardIndex(df, "shard", "k",
      probeKeys = Seq(1L, 3L, 999L), m = 4096, k = 3)
    val idx = index.orderBy("shard").collect()
    assert(idx.length === 3)
    // shard 0 has 2 distinct keys → at most 6 bits set (3 hashes each)
    assert(idx(0).getAs[Long]("n_keys") === 2L &&
      idx(0).getAs[Long]("n_bits_set") <= 6L)
    val rep = report.orderBy("probe_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // key 1 is truly in shards {0,2}: candidates must cover both (no
    // false negatives); key 3 in {1}; key 999 absent → n_true 0, and at
    // m=4096 with ≤6 bits/shard a 3-hash fp is (6/4096)³-unlikely → 0
    assert(rep.map(t => (t._1, t._3)) ===
      Seq((1L, 2L), (3L, 1L), (999L, 0L)))
    assert(rep(0)._2 >= 2L && rep(1)._2 >= 1L)
    assert(rep(2)._2 === 0L)
  }
}
