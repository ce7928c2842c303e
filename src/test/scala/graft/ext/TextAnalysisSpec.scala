package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §7.5(d): text-analysis operator semantics. */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).head().getAs[T]("v")

  // array columns collect as mutable.ArraySeq — a getAs[Seq[...]] cast to
  // immutable.Seq throws ClassCastException on use; read via getSeq + toSeq
  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("text").select(c.as("v")).head().getSeq[String](0).toSeq

  test("normalize: lowercase, collapse whitespace, trim") {
    assert(one[String](TextAnalysis.normalize(col("text")), "  Hello\t\n  WORLD  ")
      === "hello world")
  }

  test("tokens + whitespaceTokenCount: empty and padded strings") {
    assert(one[Int](TextAnalysis.whitespaceTokenCount(col("text")), "") === 0)
    assert(one[Int](TextAnalysis.whitespaceTokenCount(col("text")), "   ") === 0)
    assert(one[Int](TextAnalysis.whitespaceTokenCount(col("text")), " a  b\tc ") === 3)
  }

  test("bpeishTokenCount: letter runs, single digits, single symbols") {
    // "ab12,c" -> [ab][1][2][,][c] = 5
    assert(one[Int](TextAnalysis.bpeishTokenCount(col("text")), "ab12,c") === 5)
  }

  test("chunks: overlapping windows, clamped tail, short doc whole") {
    val df = Seq(
      "a b c d e f g h i j", // 10 tokens
      "a b"                  // shorter than one window
    ).toDF("t")
    val got = df.select(TextAnalysis.chunks(col("t"), 4, 1).as("c"))
      .as[Seq[String]].collect()
    // stride 3, starts bounded by size - overlap = 9: windows at 1, 4, 7 —
    // the last covers the tail exactly, no degenerate overlap-only window
    assert(got(0) === Seq("a b c d", "d e f g", "g h i j"))
    assert(got(1) === Seq("a b"))
  }

  test("chunks: dropEmpty yields zero windows for empty/whitespace docs only") {
    val kept = oneSeq(TextAnalysis.chunks(col("text"), 3, 1, dropEmpty = true),
      "one two three four")
    assert(kept === Seq("one two three", "three four"))
    assert(oneSeq(TextAnalysis.chunks(col("text"), 3, 1, dropEmpty = true),
      "") === Seq.empty)
    assert(oneSeq(TextAnalysis.chunks(col("text"), 3, 1, dropEmpty = true),
      " \t \n ") === Seq.empty)
    // default keeps the one-empty-chunk behavior (the x38 oracle's contract)
    assert(oneSeq(TextAnalysis.chunks(col("text"), 3, 1), "") === Seq(""))
  }

  private def applyBpe(text: String,
      merges: Seq[(Long, String, String)]): (Long, String) = {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.bpeApply(docs, "text", "doc_id",
      merges.toDF("rank", "left", "right")).head()
    (r.getAs[Long]("n_tokens"), r.getAs[String]("bpe_tokens"))
  }

  test("bpeApply: leftmost-greedy run pairing (the string-replace bug class)") {
    // runs pair from the left: a non-overlapping string replace on the
    // single-space form strands the second pair of every adjacent pair
    // of occurrences (" aaaa " -> " aa a a "); greedy yields " aa aa "
    assert(applyBpe("aaaa", Seq((0L, "a", "a"))) === ((2L, "aa aa")))
    assert(applyBpe("aaaaa", Seq((0L, "a", "a"))) === ((3L, "aa aa a")))
    assert(applyBpe("aaa", Seq((0L, "a", "a"))) === ((2L, "aa a")))
    // alternating occurrences share their delimiter space too
    assert(applyBpe("abab", Seq((0L, "a", "b"))) === ((2L, "ab ab")))
  }

  test("bpeApply: rank order IS apply order") {
    assert(applyBpe("the", Seq((0L, "t", "h"), (1L, "th", "e")))
      === ((1L, "the")))
    // reversed ranks: (h,e) fires first, (t,h) never finds its pair
    assert(applyBpe("the", Seq((0L, "h", "e"), (1L, "t", "h")))
      === ((2L, "t he")))
    // competition: rank 0's (a,l) consumes the a·l before (l,l) can pair
    assert(applyBpe("small", Seq((0L, "a", "l"), (1L, "l", "l")))
      === ((4L, "s m al l")))
  }

  test("bpeApply: merges never cross the word-boundary sentinel") {
    assert(applyBpe("a a", Seq((0L, "a", "a")))
      === ((2L, s"a ${TextAnalysis.BpeBoundary} a")))
  }

  test("bpeApply: guard rails — unique ranks, clean tokens, maxMerges") {
    intercept[IllegalArgumentException] {
      applyBpe("x", Seq((0L, "a", "b"), (0L, "c", "d")))
    }
    intercept[IllegalArgumentException] {
      applyBpe("x", Seq((0L, "a b", "c")))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeApply(Seq((1L, "x")).toDF("doc_id", "text"),
        "text", "doc_id",
        Seq((0L, "a", "b"), (1L, "c", "d")).toDF("rank", "left", "right"),
        maxMerges = 1)
    }
  }

  private def train(texts: Seq[String], nMerges: Int,
      topWords: Int = 65536): Seq[(Long, String, String, Long)] =
    TextAnalysis.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "text", nMerges, topWords)
      .orderBy("rank").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("bpeTrain: Sennrich loop — argmax, tie-break, greedy re-merge") {
    // words: the×3, cat×1, hat×1. Round 1 ties (t,h)=3 with (h,e)=3 →
    // lhs asc picks (h,e); round 2 merges (t,he); round 3 (a,t)=2;
    // round 4 ties (c,at)=1 with (h,at)=1 → (c,at).
    assert(train(Seq("the the cat", "the hat"), 4) === Seq(
      (0L, "h", "e", 3L), (1L, "t", "he", 3L),
      (2L, "a", "t", 2L), (3L, "c", "at", 1L)))
  }

  test("bpeTrain: overlap counting (get_stats), greedy application") {
    // canonical counting: run 'aaa' contributes (a,a) TWICE, beating
    // (x,y)=2 only on the tie-break; greedy counting would give (a,a)=1
    // and (x,y) would win outright — this pins the overlap semantic
    val m = train(Seq("aaa", "xy", "xy"), 1)
    assert(m === Seq((0L, "a", "a", 2L)))
    // and the APPLICATION of that merge is greedy: aaa -> aa a, so the
    // next round's top pair is (aa,a)=1 tying with (x,y)=2 → (x,y) wins
    assert(train(Seq("aaa", "xy", "xy"), 2)(1) === ((1L, "x", "y", 2L)))
  }

  test("bpeTrain: stops early when no pair remains") {
    assert(train(Seq("a b c"), 3) === Seq.empty)
    assert(train(Seq("ab c"), 3) === Seq((0L, "a", "b", 1L)))
  }

  test("bpeTrain: topWords cut is freq-desc word-asc deterministic") {
    // both words freq 1 → tie broken word asc: keep "aa", drop "bb"
    assert(train(Seq("bb aa"), 1, topWords = 1) === Seq((0L, "a", "a", 1L)))
  }

  test("bpeTrain feeds bpeApply: learned table round-trips") {
    val docs = Seq((1L, "the the cat"), (2L, "the hat")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 4)
      .select(col("rank"), col("lhs").as("left"), col("rhs").as("right"))
    val out = TextAnalysis.bpeApply(docs, "text", "doc_id", merges)
      .orderBy("doc_id").collect()
    // ranks (h,e),(t,he),(a,t),(c,at): "cat" merges fully, "hat" stops at
    // "h at" — (h,at) lost its round-4 tie to (c,at)
    assert(out.map(_.getAs[String]("bpe_tokens")).toSeq === Seq(
      s"the ${TextAnalysis.BpeBoundary} the ${TextAnalysis.BpeBoundary} cat",
      s"the ${TextAnalysis.BpeBoundary} h at"))
  }

  test("redactPii: typed placeholders, non-PII text untouched") {
    val df = Seq(
      "mail bob@example.com or call +1 (555) 123-4567 from 10.0.0.1 now",
      "no sensitive content here").toDF("t")
    val got = df.select(TextAnalysis.redactPii(col("t"))).as[String].collect()
    assert(got(0) === "mail [EMAIL] or call [PHONE] from [IP] now")
    assert(got(1) === "no sensitive content here")
  }

  test("langId: obvious languages and unknown") {
    assert(one[String](TextAnalysis.langId(col("text")),
      "the cat sat on the mat and it is happy") === "en")
    assert(one[String](TextAnalysis.langId(col("text")),
      "el perro y la casa en los campos") === "es")
    assert(one[String](TextAnalysis.langId(col("text")),
      "zxcv qwer asdf") === "unknown")
  }

  test("langId: tie broken by StopwordSets order") {
    // "en" appears in both the en and es lists? No — craft a genuine tie:
    // one en-stopword and one es-stopword → tie at 1 → first list (en) wins.
    assert(one[String](TextAnalysis.langId(col("text")), "the perro") === "en")
  }

  test("punctRatio: punctuation fraction of canonical form; empty → 0") {
    assert(one[Double](TextAnalysis.punctRatio(col("text")), "") === 0.0)
    assert(one[Double](TextAnalysis.punctRatio(col("text")), "ab,!") === 0.5)
  }

  test("qualityScores: fused expression equals the composed columns on edge cases") {
    val texts = Seq(
      "The quick brown fox JUMPS over the lazy dog",
      "",                       // empty → one empty token
      "   \t \n  ",             // all-whitespace → same as empty
      "a",                      // single 1-char token
      "the the the",            // pure stopwords, repetition
      "!!! ??? ...",            // pure punctuation tokens
      "  padded\t\twith   runs\nof whitespace  ",
      "Üñïçødé tøkens ánd ASCII mixed 42 times!",
      "a@b.c 1.2.3.4 +12 345 6789",
      "你好 世界 the end") // CJK + stopword
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val en = TextAnalysis.StopwordSets.head._2
    val toks = col("_toks")
    val composed = df
      .select(col("id"), TextAnalysis.normalize(col("text")).as("_norm"))
      .withColumn("_toks", split(col("_norm"), " "))
      .select(col("id"),
        length(col("_norm")).as("n_chars_norm"),
        size(toks).as("n_tokens"),
        TextAnalysis.punctRatioOfNorm(col("_norm")).as("punct_ratio"),
        (TextAnalysis.stopwordHits(toks, en) / size(toks)).as("stopword_ratio"),
        TextAnalysis.avgTokenLenOfToks(toks).as("avg_token_len"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val fused = df
      .select(col("id"), TextAnalysis.qualityScores(col("text")).as("_q"))
      .select(col("id"), col("_q.*"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(fused === composed)
  }

  test("rollingHash: matches manual fold, order-sensitive, canonical-form stable") {
    val m = (1L << 31) - 1
    def tokVal(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"0|$t".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16) % m
    }
    val expect = Seq("hello", "rolling", "world")
      .foldLeft(0L)((acc, t) => (acc * 131 + tokVal(t)) % m)
    assert(one[Long](TextAnalysis.rollingHash(col("text")), "Hello  ROLLING world") === expect)
    val h1 = one[Long](TextAnalysis.rollingHash(col("text")), "a b c")
    val h2 = one[Long](TextAnalysis.rollingHash(col("text")), "c b a")
    assert(h1 !== h2) // order-sensitive, unlike the digest fingerprint
  }

  test("hashedLinearScore: matches the independent md5-slice mean; " +
    "bias shifts; normalization-invariant") {
    def w(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"clf|$t".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val toks = Seq("hello", "scored", "world")
    val a = (toks.map(w).sum.toDouble / 3) / 4294967296.0
    val expect = 0.0 + a - 0.5 // same association as the Column expression
    assert(one[Double](TextAnalysis.hashedLinearScore(col("text")),
      "Hello  SCORED world") === expect)
    assert(one[Double](TextAnalysis.hashedLinearScore(col("text"), bias = 1.0),
      "Hello  SCORED world") === 1.0 + a - 0.5)
    // scores live in [-0.5, 0.5) + bias
    assert(math.abs(expect) <= 0.5)
  }

  test("fingerprint: equal canonical forms collide, different texts do not") {
    val fps = Seq("Hello  World", "hello world", "other")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("winnowFingerprints: coverage guarantee (shared k+w-1-token " +
    "substring shares a fingerprint), window min selection, short docs") {
    val shared = "alpha beta gamma delta epsilon zeta"   // 6 = k+w-1 tokens
    val docs = Seq(
      (1L, s"one two $shared three four five six"),
      (2L, s"nine eight seven $shared ten eleven"),
      (3L, "tiny doc"),                                  // < k tokens
      (4L, "unrelated words entirely different content here")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "text", "doc_id",
      k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // the guarantee: docs 1 and 2 share at least one selected hash
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // no spurious sharing with the unrelated doc
    assert((byDoc(1L) & byDoc(4L)).isEmpty)
    // short doc: one whole-doc gram, one fingerprint at pos 1
    assert(fps.filter(_._1 == 3L).toSeq.map(t => (t._2, t._3)).length === 1)
    assert(fps.filter(_._1 == 3L).head._2 === 1)
    // every selected fp is the min of SOME window: selected count is
    // bounded by window count and ≥ 1 per w consecutive windows
    val n1 = fps.count(_._1 == 1L)
    assert(n1 >= 2 && n1 <= 10)   // 12 tokens → 10 grams → 7 windows
    // deterministic under repartition
    val again = TextAnalysis.winnowFingerprints(docs.repartition(5),
      "text", "doc_id", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.sorted.toSeq === fps.sorted.toSeq)
  }

  test("winnowOverlapAgainst: a batch doc sharing >= k+w-1 tokens with " +
    "the corpus MUST hit the maintained table; unrelated docs don't") {
    val passage = "alpha beta gamma delta epsilon zeta"   // 6 = k+w-1
    val corpus = Seq(
      (1L, s"leading words here $passage trailing content words"),
      (2L, "other corpus text entirely")
    ).toDF("doc_id", "text")
    val table = TextAnalysis.winnowTable(corpus, "text", "doc_id",
      k = 3, w = 4)
    val batch = Seq(
      (10L, s"brand new framing $passage and different tail"),
      (11L, "nothing shared with anything at all truly")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowOverlapAgainst(batch, table, "text",
      "doc_id", k = 3, w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("shared_frac"))).toMap
    assert(got(10L)._1 >= 1L, "coverage guarantee")
    assert(got(11L) === ((0L, 0.0)))
    // table rows carry the smallest owning doc id
    assert(table.filter(col("doc_id") === 1L).count() > 0)
  }

  test("codeSwitchFlag: bilingual halves flag mixed; monolingual, " +
    "unknown-half, and odd-length docs do not mis-flag") {
    val docs = Seq(
      // en head, de tail → mixed
      (1L, "the cat is in a the hat der hund ist ein und das zu"),
      // monolingual en → not mixed
      (2L, "the cat is in the hat and it is a cat"),
      // head en, tail has no stopwords → unknown tail, not mixed
      (3L, "the cat is in xxx yyy zzz www"),
      // odd length: head takes the extra token (7 → 4+3)
      (4L, "the the the the und und und"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.codeSwitchFlag(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
    assert(got(1L) === (("en", "de", true)))
    assert(got(2L) === (("en", "en", false)))
    assert(got(3L)._1 === "en" && got(3L)._2 === "unknown" && !got(3L)._3)
    // 4 'the' in the head, 3 'und' in the tail
    assert(got(4L) === (("en", "de", true)))
    assert(!got.contains(5L))
  }
}
