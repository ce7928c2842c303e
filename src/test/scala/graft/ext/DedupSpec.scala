package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §7.5(a): dedup operator semantics on small in-memory corpora. */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "an entirely different document about spark engines"),
    (4L, "the quick brown fox jumps over the lazy cat")   // near-dup of 1
  ).toDF("doc_id", "text")

  test("exactSubstringDups: maximal cross-doc runs >= minTokens, exact " +
    "positions, sub-minimum and absent overlaps excluded") {
    val d = Seq(
      // docs 1/2 share the maximal 8-token run "c1 .. c8" at different
      // offsets (doc 1 tokens 3-10, doc 2 tokens 1-8); the surrounding
      // tokens differ so the run must not extend past 8
      (1L, "a1 a2 c1 c2 c3 c4 c5 c6 c7 c8 a3 a4"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 b1 b2 b3 b4"),
      // doc 3 shares only 7 tokens of the run — below minTokens
      (3L, "d1 c1 c2 c3 c4 c5 c6 c7 d2 d3 d4 d5"),
      // doc 4 is unrelated
      (4L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDups(d, "text", "doc_id",
        minTokens = 8, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 2L, 3L, 1L, 8L)))
  }

  test("exactSubstringDups: whole-document copies extend to full length; " +
    "every pair of the copy group is reported") {
    val copy = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val d = Seq((1L, copy), (2L, copy), (3L, copy)).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDups(d, "text", "doc_id",
        minTokens = 8, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out === Set((1L, 2L, 1L, 1L, 10L), (1L, 3L, 1L, 1L, 10L),
      (2L, 3L, 1L, 1L, 10L)))
  }

  test("exactSubstringStrip: smaller id keeps, larger id loses the run; " +
    "unaffected and sub-minimum docs intact; full copies strip to NULL") {
    val copy = "c1 c2 c3 c4 c5 c6 c7 c8"
    val d = Seq(
      (1L, s"a1 a2 $copy a3"),  // first owner — keeps everything
      (2L, s"$copy b1 b2"),     // loses tokens 1-8
      (3L, "d1 c1 c2 c3 c4 c5 c6 c7"), // 7-token overlap only — intact
      (4L, copy)                // vs doc 1/2: whole doc removed -> NULL
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringStrip(d, "text", "doc_id",
        minTokens = 8, k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    assert(out(1L) === ((11L, 0L, Some(s"a1 a2 $copy a3"))))
    assert(out(2L) === ((10L, 8L, Some("b1 b2"))))
    assert(out(3L) === ((8L, 0L, Some("d1 c1 c2 c3 c4 c5 c6 c7"))))
    assert(out(4L) === ((8L, 8L, None)))
  }

  test("exactSubstringAgainst: batch runs found only vs the corpus side; " +
    "within-batch duplication not reported; positions exact") {
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    val corpus = Seq(
      (1L, s"x1 $run x2"),      // owns the run at tokens 2-9
      (2L, "y1 y2 y3 y4 y5 y6 y7 y8 y9")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"$run z1"),        // hits corpus doc 1
      (11L, s"$run z2"),        // also hits doc 1 — but NOT doc 10
      (12L, "w1 w2 w3 w4 w5 w6 w7 w8")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringAgainst(batch, corpus, "text", "doc_id",
        minTokens = 8, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out === Set((1L, 10L, 2L, 1L, 8L), (1L, 11L, 2L, 1L, 8L)))
  }

  test("exactSubstringDups: maxAnchorDf guard fails fast on a " +
    "boilerplate-grade fingerprint") {
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val d = (1L to 5L).map(i => (i, s"u${i}a $span u${i}b"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.exactSubstringDups(d, "text", "doc_id", minTokens = 8, k = 4,
        maxAnchorDf = 3L)
    }
    assert(e.getMessage.contains("boilerplateStrip"))
  }

  test("dupSpans: shifted copies caught at any alignment; within-doc " +
    "repeats and short docs are not 'shared'") {
    val d = Seq(
      (1L, "a b c d e f"),   // spans@k=4,s=2: "a b c d", "c d e f"
      (2L, "z z a b c d"),   // "z z a b", "a b c d" ← shares with doc 1
      (3L, "q r s t u v"),   // unique spans
      (4L, "x y"),           // short doc: one whole-text span
      (5L, "m n m n m n")    // internal repeat only — not cross-doc
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(d, "text", "doc_id", spanTokens = 4, stride = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("shared_span_frac"))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((2L, 0L, 0.0)))
    assert(out(4L) === ((1L, 0L, 0.0)))
    assert(out(5L) === ((2L, 0L, 0.0)))
  }

  test("exact: one survivor per distinct text, min id wins") {
    val out = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .as[Long].collect().sorted
    assert(out === Array(1L, 3L, 4L))
  }

  test("shingleArray: sliding windows; short text yields one whole-text shingle") {
    val df = Seq("abcdefg", "ab").toDF("t")
    val got = df.select(Dedup.shingleArray(col("t"), 5).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("abcde", "bcdef", "cdefg"))
    assert(got(1) === Seq("ab"))
  }

  test("wordNgrams: sliding word windows; short docs yield one partial gram") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("a", "b")).toDF("toks")
    val got = df.select(Dedup.wordNgrams(col("toks"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("a b"))
  }

  test("minhashSignatures: deterministic, equal for equal texts, wide for k") {
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", k = 8, shingleLen = 5)
    assert(sig.columns.toSeq === ("doc_id" +: (0 until 8).map(i => s"m$i")))
    val rows = sig.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) === rows(2L)) // identical text => identical signature
    assert(rows(1L) !== rows(3L))
    val again = Dedup.minhashSignatures(docs, "text", "doc_id", k = 8, shingleLen = 5)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows === again) // deterministic across runs
  }

  test("minhashNearDups: finds planted near-dup with exact integer Jaccard, skips unrelated") {
    val corpus = Seq(
      (10L, "large language models are trained on vast corpora of text data from the web"),
      (11L, "large language models are trained on vast corpora of text data from the net"),
      (12L, "completely unrelated content about volcanoes and earthquake magnitudes here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
      k = 16, bands = 4, shingleLen = 7, thNum = 3, thDen = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)))
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L))
  }

  test("minhashNearDupsAgainst: cross-side pairs only, same-side dups invisible") {
    val existing = Seq(
      (10L, "large language models are trained on vast corpora of text data from the web"),
      (11L, "large language models are trained on vast corpora of text data from the net"),
      (12L, "completely unrelated content about volcanoes and earthquake magnitudes here")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (20L, "large language models are trained on vast corpora of text data from the web"),
      (21L, "another totally distinct new document about streaming watermark semantics")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupsAgainst(fresh, existing, "text", "doc_id",
      k = 16, bands = 4, shingleLen = 7, thNum = 3, thDen = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the new exact copy matches BOTH near-identical existing docs; the
    // existing-side (10, 11) pair is same-side and must not appear
    assert(pairs.contains((20L, 10L)) && pairs.contains((20L, 11L)))
    assert(pairs.forall { case (a, b) => a >= 20L && b < 20L })
    assert(!pairs.exists(p => p._1 == 21L))
  }

  test("minhashNearDupsAgainstSigs: maintained signature table reproduces " +
    "the recompute path exactly") {
    val existing = Seq(
      (10L, "large language models are trained on vast corpora of text data from the web"),
      (11L, "large language models are trained on vast corpora of text data from the net"),
      (12L, "completely unrelated content about volcanoes and earthquake magnitudes here")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (20L, "large language models are trained on vast corpora of text data from the web"),
      (21L, "another totally distinct new document about streaming watermark semantics")
    ).toDF("doc_id", "text")
    // the maintained table is exactly what ingest would have appended:
    // minhashSignatures over the corpus, materialized once
    val sigs = Dedup.minhashSignatures(existing, "text", "doc_id",
      k = 16, shingleLen = 7)
    val viaSigs = Dedup.minhashNearDupsAgainstSigs(fresh, sigs, existing,
        "text", "doc_id", k = 16, bands = 4, shingleLen = 7, thNum = 3, thDen = 5)
      .collect().map(_.toSeq).toSet
    val recompute = Dedup.minhashNearDupsAgainst(fresh, existing,
        "text", "doc_id", k = 16, bands = 4, shingleLen = 7, thNum = 3, thDen = 5)
      .collect().map(_.toSeq).toSet
    assert(viaSigs === recompute)
    assert(viaSigs.nonEmpty)
  }

  test("minhashNearDupsAgainstSigs: signature table APPENDED across corpus " +
    "growth still equals the recompute path") {
    // The production claim behind x41: the corpus-side signature table is
    // computed once per document at ingest and APPENDED — never rebuilt.
    // Simulate two ingest generations into one parquet table and check a
    // later delta batch sees near-dups from BOTH generations, identically
    // to re-signaturing the whole grown corpus.
    val gen0 = Seq(
      (10L, "large language models are trained on vast corpora of text data from the web"),
      (12L, "completely unrelated content about volcanoes and earthquake magnitudes here")
    ).toDF("doc_id", "text")
    val gen1 = Seq(
      (13L, "streaming watermark semantics govern state cleanup in windowed aggregations"),
      (14L, "large language models are trained on vast corpora of text data from the net")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sig_append").toString
    val sigTable = s"$dir/minhash_sigs"
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(df, "text", "doc_id", k = 16, shingleLen = 7)
    sigs(gen0).write.mode("overwrite").parquet(sigTable)
    sigs(gen1).write.mode("append").parquet(sigTable) // gen0 never re-hashed
    val grown = gen0.unionByName(gen1)
    val batch = Seq(
      (20L, "large language models are trained on vast corpora of text data from the web"),
      (21L, "another totally distinct new document about graph label propagation")
    ).toDF("doc_id", "text")
    val viaSigs = Dedup.minhashNearDupsAgainstSigs(batch,
        spark.read.parquet(sigTable), grown,
        "text", "doc_id", k = 16, bands = 4, shingleLen = 7, thNum = 3, thDen = 5)
      .collect().map(_.toSeq).toSet
    val recompute = Dedup.minhashNearDupsAgainst(batch, grown,
        "text", "doc_id", k = 16, bands = 4, shingleLen = 7, thNum = 3, thDen = 5)
      .collect().map(_.toSeq).toSet
    assert(viaSigs === recompute)
    // matches must span both ingest generations, proving appended rows and
    // original rows participate equally
    val matched = viaSigs.map(r => r(1).asInstanceOf[Long])
    assert(matched.contains(10L) && matched.contains(14L))
  }

  test("ngramOverlapAgainst: flags shared long grams across sides only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark engines and shuffles")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "witnesses said the quick brown fox jumps over the lazy dog tonight again"),
      (101L, "nothing in common with anything in this corpus at all whatsoever")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramOverlapAgainst(corpus, eval, "text", "doc_id", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // corpus doc 1's 10 tokens contain 3 distinct 8-grams; all 3 appear in
    // eval doc 100's longer text
    assert(got === Map((1L, 100L) -> 3L))
    // the broadcast-side bound is mechanical: a too-big eval set names it
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramOverlapAgainst(corpus, eval, "text", "doc_id", n = 8,
        maxEvalDocs = 1L)
    }
    assert(e.getMessage.contains("maxEvalDocs"))
  }

  test("ngramOverlapAgainstEvalSets: one pass scores N tagged sets, " +
    "distinct grams and eval docs per set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark engines and shuffles")
    ).toDF("doc_id", "text")
    val evals = Seq(
      // both benchA docs contain doc 1's full 10-token text → the same 3
      // distinct 8-grams hit twice, must still count 3 (not 6)
      (100L, "A", "witnesses said the quick brown fox jumps over the lazy dog tonight again"),
      (102L, "A", "so the quick brown fox jumps over the lazy dog tonight yes"),
      (101L, "B", "the quick brown fox jumps over the lazy dog tonight"),
      (103L, "B", "nothing in common with anything in this corpus at all whatsoever")
    ).toDF("doc_id", "bench", "text")
    val got = Dedup.ngramOverlapAgainstEvalSets(corpus, evals, "bench",
      "text", "doc_id", n = 8)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      (1L, "A") -> ((3L, 2L)),   // 3 distinct grams, both A docs reached
      (1L, "B") -> ((3L, 1L))))  // same grams, only doc 101 in B
    // the broadcast bound counts ALL sets' docs together
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramOverlapAgainstEvalSets(corpus, evals, "bench",
        "text", "doc_id", n = 8, maxEvalDocs = 3L)
    }
    assert(e.getMessage.contains("maxEvalDocs"))
  }

  test("ngramOverlapAgainstGramTable: maintained gram table reproduces " +
    "the broadcast path, including after an appended benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark engines and shuffles")
    ).toDF("doc_id", "text")
    val evals = Seq(
      (100L, "A", "witnesses said the quick brown fox jumps over the lazy dog tonight again"),
      (101L, "B", "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "bench", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val viaBroadcast = canon(Dedup.ngramOverlapAgainstEvalSets(
      corpus, evals, "bench", "text", "doc_id", n = 8))
    val table = Dedup.evalSetGramTable(evals, "bench", "text", "doc_id", n = 8)
    assert(canon(Dedup.ngramOverlapAgainstGramTable(
      corpus, table, "text", "doc_id", n = 8)) === viaBroadcast)
    // registering a new benchmark appends its grams; the next scan sees it
    val more = Seq((102L, "C", "the quick brown fox jumps over the lazy dog tonight too"))
      .toDF("doc_id", "bench", "text")
    val appended = table.unionByName(
      Dedup.evalSetGramTable(more, "bench", "text", "doc_id", n = 8))
    val got = canon(Dedup.ngramOverlapAgainstGramTable(
      corpus, appended, "text", "doc_id", n = 8))
    assert(got === viaBroadcast + ((1L, "C", 3L, 1L)))
  }

  test("jaccardVerify: inter/uni counts are exact set arithmetic") {
    val corpus = Seq((1L, "abcdef"), (2L, "abcdeg")).toDF("doc_id", "text")
    val cands = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    // 3-shingles: doc1 {abc,bcd,cde,def}, doc2 {abc,bcd,cde,deg} → inter 3, uni 5
    val row = Dedup.jaccardVerify(corpus, cands, "text", "doc_id", shingleLen = 3)
      .head()
    assert(row.getAs[Long]("inter") === 3L)
    assert(row.getAs[Long]("uni") === 5L)
  }

  test("simhashNearDups: identical docs at hamming 0; banding finds them; unrelated absent") {
    val corpus = Seq(
      (10L, "large language models are trained on vast corpora of text data from the web"),
      (11L, "large language models are trained on vast corpora of text data from the web"),
      (12L, "completely unrelated content about volcanoes and earthquake magnitudes here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(corpus, "text", "doc_id",
      bits = 48, bands = 4, maxHam = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((10L, 11L)) === Some(0))
    assert(!pairs.keySet.exists(p => p._1 == 12L || p._2 == 12L))
  }

  test("simhash: equal texts agree, fingerprint fits in 32 bits, near-dups are close") {
    val fp = Dedup.simhash(docs, "text", "doc_id", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp.values.forall(v => v >= 0 && v <= 0xffffffffL))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(4L)) < ham(fp(1L), fp(3L)))
  }

  test("dupClusters: transitive chains collapse to min-id canonical, " +
    "components stay separate, empty input → empty output") {
    import spark.implicits._
    // chain 1-2, 2-3 (one component) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(Dedup.dupClusters(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .count() === 0L)
  }

  test("dupClusters: pointer doubling converges within maxIters on a long " +
    "chain and matches a reference union-find exactly") {
    import spark.implicits._
    // adversarial chain: a 10,000-node path (diameter 9,999 — members
    // over the size gate, so the hop fires from round 4). The
    // single-hop form needs ~10k rounds and would FAIL the default
    // maxIters=30; size-gated pointer doubling must converge in
    // O(log d) rounds.
    val chain = (1L until 10000L).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(chain).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(out.keySet === (1L to 10000L).toSet)
    assert(out.values.forall(_ == 1L))
    // multiset equality vs a driver-side union-find reference on an
    // adversarial mix: two interleaved chains whose min ids sit at the
    // ends, a star, a duplicate edge, and out-of-order ids
    val mix = Seq((7L, 8L), (8L, 9L), (9L, 10L), (2L, 5L), (5L, 3L),
      (3L, 4L), (20L, 21L), (20L, 22L), (20L, 23L), (30L, 31L),
      (30L, 31L), (40L, 41L), (35L, 41L))
    val got = Dedup.dupClusters(mix.toDF("doc_a", "doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mix.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keySet.map(x => (find(x), x)).toSet
    assert(got === want)
  }

  test("dedupByClusters: keeps canonicals and untouched docs, drops other members") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.dedupByClusters(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L)) // 2,3 collapse into 1; 6 into 5; 4 untouched
  }

  test("dedupByClustersBest: highest score survives per cluster, ties by " +
    "min id, null scores lose, untouched docs kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some(10.0)), (2L, Some(30.0)), (3L, Some(30.0)),  // {1,2,3}: 2 wins (tie 2<3)
      (4L, Some(5.0)),                                       // untouched
      (5L, Some(7.0)), (6L, None)
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.dedupByClustersBest(docs, "doc_id", pairs, "score")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L, 5L)) // 5 beats null-scored 6
  }

  test("withinDocRepetition: exact tile counts, dup fraction, top tile") {
    val docs = Seq(
      (1L, "a b a b a b"),   // tiles(2): ab, ab, ab → 3 segs, 1 distinct
      (2L, "a b c d"),       // ab, cd → no repeats
      (3L, "x y x y z w")    // xy, xy, zw → top 2
    ).toDF("doc_id", "text")
    val out = Dedup.withinDocRepetition(docs, "text", "doc_id", segTokens = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out === Map(
      1L -> (3L, 1L, 1.0 - 1.0 / 3.0, 3L),
      2L -> (2L, 2L, 0.0, 1L),
      3L -> (3L, 2L, 1.0 - 2.0 / 3.0, 2L)))
  }

  test("segmentOverlapMatrix: distinct shared segment values per stratum " +
    "pair, a < b only, empty intersections absent") {
    val docs = Seq(
      (1L, "en", "a b c d"),   // {ab, cd}
      (2L, "fr", "a b"),       // {ab}
      (3L, "fr", "c d x y"),   // {cd, xy}
      (4L, "de", "x y")        // {xy}
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.segmentOverlapMatrix(docs, "text", "lang", "doc_id",
      segTokens = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // en∩fr = {ab, cd}; de∩fr = {xy}; de∩en = ∅ (no row)
    assert(out === Map(("en", "fr") -> 2L, ("de", "fr") -> 1L))
  }

  test("segmentDedup: first occurrence wins corpus-wide AND within a doc; " +
    "fully-claimed docs surface as NULL; partition-invariant") {
    val docs = Seq(
      (1L, "a b c d"),   // both segments novel
      (2L, "a b x y"),   // "a b" claimed by doc 1, "x y" novel
      (3L, "c d"),       // whole doc claimed by doc 1's second segment
      (4L, "z z z z")    // within-doc repeat: second "z z" claimed by first
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.segmentDedup(d, "text", "doc_id", segTokens = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    val out = run(docs)
    assert(out === Map(
      1L -> (2L, 2L, Some("a b c d")),
      2L -> (2L, 1L, Some("x y")),
      3L -> (1L, 0L, None),
      4L -> (2L, 1L, Some("z z"))))
    assert(run(docs.repartition(7)) === out)
  }

  test("boilerplateStrip: high-DF tiles removed EVERYWHERE within their " +
    "source only; below-threshold and single-doc tiles survive") {
    // src A (4 docs): "nav bar" in 3/4 docs (0.75 > 0.5) → boilerplate;
    // "a b" in 2/4 (0.5, not > 0.5) → stays; src B has "nav bar" in 1/2
    // docs — same tile, different source, stays
    val d = Seq(
      (1L, "nav bar a b", "A"), (2L, "nav bar c d", "A"),
      (3L, "nav bar e f", "A"), (4L, "a b g h", "A"),
      (5L, "nav bar p q", "B"), (6L, "r s t u", "B")
    ).toDF("doc_id", "text", "source")
    def run(x: org.apache.spark.sql.DataFrame) =
      Dedup.boilerplateStrip(x, "text", "doc_id", "source",
        segTokens = 2, maxDocFrac = 0.5)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    val out = run(d)
    assert(out === Map(
      1L -> (2L, 1L, Some("a b")),
      2L -> (2L, 1L, Some("c d")),
      3L -> (2L, 1L, Some("e f")),
      4L -> (2L, 2L, Some("a b g h")),
      5L -> (2L, 2L, Some("nav bar p q")),
      6L -> (2L, 2L, Some("r s t u"))))
    assert(run(d.repartition(5)) === out)
  }

  test("syndicationMatrix: near-dup pairs roll up per unordered source " +
    "pair; diagonal is within-source duplication") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, base, "A"), (2L, base, "B"),            // A↔B syndication
      (3L, base, "B"),                             // B↔B and more A/B pairs
      (4L, "totally unrelated text about engines", "C")
    ).toDF("doc_id", "text", "source")
    val m = Dedup.syndicationMatrix(d, "text", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // pairs: (1,2) A-B, (1,3) A-B, (2,3) B-B
    assert(m === Map(("A", "B") -> 2L, ("B", "B") -> 1L))
  }

  test("ngramContainmentPairs: an excerpt inside a long doc flags on " +
    "containment though its Jaccard is tiny; contained_id names it") {
    val excerpt = "alpha beta gamma delta epsilon"           // 3 grams @ n=3
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")    // unique grams
    val d = Seq(
      (1L, s"$filler $excerpt"),   // long host doc
      (2L, excerpt),               // fully contained excerpt
      (3L, "completely different words everywhere here now")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(d, "text", "doc_id",
      n = 3, thNum = 4, thDen = 5).collect()
    assert(cont.length === 1)
    val r = cont.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("contained_id")) === ((1L, 2L, 2L)))
    assert(r.getAs[Double]("containment") === 1.0)
    // the same pair is INVISIBLE to Jaccard at the standard 3/5 threshold
    val jac = Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3)
    assert(jac.count() === 0L)
  }

  test("lshPlan: S-curve math correct, planned params meet both " +
    "constraints, defaults' curve behaves as documented") {
    // closed form spot-check: r=2, b=2 at j=0.5 → 1−(1−0.25)² = 0.4375
    assert(math.abs(Dedup.lshCollisionProb(0.5, 4, 2) - 0.4375) < 1e-12)
    // the planner's choice satisfies what it promises
    val (k, b) = Dedup.lshPlan(jThreshold = 0.8, minRecall = 0.95,
      jLow = 0.3, maxFpRate = 0.05)
    assert(k % b === 0)
    assert(Dedup.lshCollisionProb(0.8, k, b) >= 0.95)
    assert(Dedup.lshCollisionProb(0.3, k, b) <= 0.05)
    // no smaller signature with fewer-or-equal bands would do: k is the
    // minimum over the search space by construction — verify k > the
    // largest k' < k for which ANY bands config passes
    for (k2 <- 1 until k; b2 <- 1 to k2 if k2 % b2 == 0)
      assert(!(Dedup.lshCollisionProb(0.8, k2, b2) >= 0.95 &&
        Dedup.lshCollisionProb(0.3, k2, b2) <= 0.05))
    // the x3/x41 production defaults (k=16, bands=4): high recall at
    // j=0.8, sharp drop below
    assert(Dedup.lshCollisionProb(0.8, 16, 4) > 0.85)
    assert(Dedup.lshCollisionProb(0.2, 16, 4) < 0.01)
    // monotone in j
    assert(Dedup.lshCollisionProb(0.9, 16, 4) >
      Dedup.lshCollisionProb(0.5, 16, 4))
  }

  test("ngramJaccardPairsPrefix: identical result to ngramJaccardPairs " +
    "on dup/near-dup/stop-gram corpus, at two thresholds") {
    // mix: exact dup pair, near-dup pair, disjoint doc, plus a gram that
    // appears in every doc (prefix ordering must push it to the suffixes)
    val stop = "common phrase here"
    val d = Seq(
      (1L, s"$stop the quick brown fox jumps over the lazy dog today"),
      (2L, s"$stop the quick brown fox jumps over the lazy dog today"),
      (3L, s"$stop an entirely different document about spark engines"),
      (4L, s"$stop the quick brown fox jumps over the lazy cat today")
    ).toDF("doc_id", "text")
    for ((tn, td) <- Seq((3, 5), (9, 10))) {
      val full = Dedup.ngramJaccardPairs(d, "text", "doc_id",
        n = 3, thNum = tn, thDen = td)
        .orderBy("doc_a", "doc_b").collect().toSeq
      val pfx = Dedup.ngramJaccardPairsPrefix(d, "text", "doc_id",
        n = 3, thNum = tn, thDen = td)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(pfx === full, s"threshold $tn/$td")
      assert(full.nonEmpty) // the corpus really has qualifying pairs
    }
  }

  test("ngramContainmentPairsPrefix: identical result to " +
    "ngramContainmentPairs, including the doc-in-doc case a symmetric " +
    "Jaccard prefix would miss") {
    val excerpt =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val stop = "common phrase here"
    val d = Seq(
      (1L, s"$stop $filler $excerpt"),  // long host: excerpt buried in it
      (2L, s"$stop $excerpt"),          // the contained excerpt
      (3L, s"$stop the quick brown fox jumps over the lazy dog today"),
      (4L, s"$stop the quick brown fox jumps over the lazy cat today"),
      (5L, s"$stop an entirely different document about spark engines")
    ).toDF("doc_id", "text")
    for ((tn, td) <- Seq((4, 5), (3, 5), (9, 10))) {
      val full = Dedup.ngramContainmentPairs(d, "text", "doc_id",
        n = 3, thNum = tn, thDen = td)
        .orderBy("doc_a", "doc_b").collect().toSeq
      val pfx = Dedup.ngramContainmentPairsPrefix(d, "text", "doc_id",
        n = 3, thNum = tn, thDen = td)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(pfx === full, s"threshold $tn/$td")
      // 9/10 is deliberately above every pair: both must return empty
      if ((tn, td) != ((9, 10))) assert(full.nonEmpty, s"threshold $tn/$td")
      // the asymmetric case is really present: (1,2) qualifies on
      // containment at 4/5 though its Jaccard is far below
      if ((tn, td) == ((4, 5)))
        assert(full.exists(r => r.getAs[Long]("doc_a") == 1L &&
          r.getAs[Long]("doc_b") == 2L && r.getAs[Long]("contained_id") == 2L))
    }
  }

  test("minhashRecallReport: identical docs land in band 20 at recall 1; " +
    "sub-threshold pairs are not ground truth; the guard trips") {
    val tmpl = "large language models are trained on vast corpora of text " +
      "data scraped from across the public web today"
    val d = Seq(
      (1L, tmpl), (2L, tmpl),      // identical pair: J = 1.0, band 20
      (3L, "an entirely different document about streaming watermarks")
    ).toDF("doc_id", "text")
    val rep = Dedup.minhashRecallReport(d, "text", "doc_id",
      k = 16, bands = 4, shingleLen = 7).collect()
    assert(rep.length === 1)
    assert(rep.head.getAs[Int]("band") === 20)
    assert(rep.head.getAs[Long]("n_exact") === 1L)
    assert(rep.head.getAs[Long]("n_found") === 1L)
    assert(rep.head.getAs[Double]("recall") === 1.0)
    intercept[IllegalArgumentException] {
      Dedup.minhashRecallReport(d, "text", "doc_id", maxExactRows = 2L)
    }
  }

  test("ngramContainmentAgainst: both probe directions find cross-side " +
    "quotes; frozen-df semantics; no within-side pairs") {
    val excerpt =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val filler2 = (1 to 60).map(i => s"v$i").mkString(" ")
    val corpus = Seq(
      (10L, s"$filler $excerpt"),  // long corpus host (for direction 1? no:
                                   // batch quote of this host is dir-1)
      (11L, excerpt),              // small corpus doc (quoted by a big arrival)
      (12L, "completely unrelated corpus content about volcanoes here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, excerpt),                 // direction 1: arrival quoted FROM 10/11
      (21L, s"$filler2 $excerpt"),    // direction 2: corpus 11 quoted INSIDE
      (22L, "nothing resembling anything in the corpus whatsoever today")
    ).toDF("doc_id", "text")
    val idx = Dedup.containmentIndex(corpus, "text", "doc_id",
      n = 3, thNum = 4, thDen = 5)
    val out = Dedup.ngramContainmentAgainst(batch, idx, "text", "doc_id",
      n = 3, thNum = 4, thDen = 5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("contained_id")).toMap
    // direction 1: batch 20 (= the excerpt) is contained in corpus 10
    // and identical to corpus 11
    assert(out.contains((20L, 10L)) && out((20L, 10L)) === 20L)
    assert(out.contains((20L, 11L)))
    // direction 2: corpus 11 is contained in the big arrival 21
    assert(out.contains((21L, 11L)) && out((21L, 11L)) === 11L)
    // unrelated docs pair with nothing; no corpus-corpus or batch-batch
    // pairs ever appear
    assert(!out.keys.exists { case (a, b) => a == 22L || b == 12L })
    assert(out.keys.forall { case (a, b) => a >= 20L && b < 20L })
    // frozen-df semantics: a gram occurring in > maxDf corpus docs is cut
    // from BOTH sides' sets — with maxDf = 1, every corpus gram of the
    // shared excerpt (df 2: docs 10 and 11) is cut, so doc 20 matches
    // nothing though its text is identical to corpus 11
    val idxCut = Dedup.containmentIndex(corpus, "text", "doc_id",
      n = 3, thNum = 4, thDen = 5, maxDf = 1)
    val cut = Dedup.ngramContainmentAgainst(
      batch.filter(col("doc_id") === 20L), idxCut, "text", "doc_id",
      n = 3, thNum = 4, thDen = 5, maxDf = 1)
    assert(cut.count() === 0L)
  }

  test("ngramJaccardPairsPrefix: df cut drops mega-grams from the " +
    "universe exactly as in ngramJaccardPairs") {
    val shared = "x y z"                       // one gram shared by all
    val d = (1L to 6L).map(i => (i, s"$shared unique$i gram$i tail$i"))
      .toDF("doc_id", "text")
    // maxDf=2 cuts the shared gram (df=6): no pair shares anything
    val full = Dedup.ngramJaccardPairs(d, "text", "doc_id", n = 3,
      thNum = 1, thDen = 10, maxDf = 2).collect()
    val pfx = Dedup.ngramJaccardPairsPrefix(d, "text", "doc_id", n = 3,
      thNum = 1, thDen = 10, maxDf = 2).collect()
    assert(full.isEmpty && pfx.isEmpty)
  }

  test("boilerplateStrip: a doc that is all boilerplate surfaces as NULL") {
    val d = Seq(
      (1L, "nav bar", "A"), (2L, "nav bar", "A"), (3L, "nav bar", "A"),
      (4L, "real content here now", "A")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.boilerplateStrip(d, "text", "doc_id", "source",
      segTokens = 2, maxDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out === Map(1L -> None, 2L -> None, 3L -> None,
      4L -> Some("real content here now")))
  }
}
