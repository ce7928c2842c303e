package graft

import graft.ext.Dedup
import graft.ingest.Staging
import graft.ods.OdsTransform
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage (SURVEY §5.3) with deterministic ScalaCheck
  * sampling: each property materializes one generated batch and runs a
  * single Spark job over it, instead of a job per ScalaCheck case.
  */
class PropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long = 42L): List[T] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  /** Independent reimplementation of the reference key
    * (`ods_delta_load2.py:18-24`): sha1 hex, first 16 chars, 63-bit mask;
    * None fields format as "None" inside the f-string.
    */
  private def pyStableId(t: Option[String], la: Option[String], lo: Option[String]): Long = {
    val key = s"${t.getOrElse("None")}_${la.getOrElse("None")}_${lo.getOrElse("None")}"
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest(key.getBytes("UTF-8"))
    val hex = sha.map(b => f"${b & 0xff}%02x").mkString.take(16)
    java.lang.Long.parseUnsignedLong(hex, 16) & Long.MaxValue
  }

  private val field: Gen[Option[String]] = Gen.frequency(
    8 -> Gen.chooseNum(-18000000L, 18000000L).map(v => Some((v / 100000.0).toString)),
    1 -> Gen.alphaNumStr.map(s => Some(s.take(24))),
    1 -> Gen.const(None))

  test("property: stableId matches the reference sha1 formula; positive; collision-free on sample") {
    val rows = sample(Gen.zip(field, field, field), 300)
    val df = rows.toDF("t", "la", "lo")
      .select(col("t"), col("la"), col("lo"),
        OdsTransform.stableId(col("t"), col("la"), col("lo")).as("id"))
    val got = df.collect().map(r =>
      ((Option(r.getString(0)), Option(r.getString(1)), Option(r.getString(2))),
        r.getLong(3)))
    got.foreach { case (k, id) =>
      assert(id === pyStableId(k._1, k._2, k._3), s"key=$k")
      assert(id >= 0)
    }
    val distinctKeys = rows.map(k => (k._1.getOrElse("None"), k._2.getOrElse("None"),
      k._3.getOrElse("None"))).distinct.size
    assert(got.map(_._2).distinct.length === distinctKeys)
  }

  test("property: every non-null magnitude/depth lands in exactly one bucket") {
    val magGen = Gen.frequency(
      6 -> Gen.chooseNum(-2.0, 12.0),
      3 -> Gen.oneOf(3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 70.0, 300.0),
      1 -> Gen.oneOf(2.999999, 8.000001, 69.999999, 300.000001))
    val vals = sample(magGen, 400)
    val df = vals.toDF("v").select(col("v"),
      OdsTransform.magCategory(col("v")).as("mc"),
      OdsTransform.depthCategory(col("v")).as("dc"))
    val magBuckets = Set("Not Felt", "Minor", "Light", "Moderate", "Strong", "Major", "Great")
    val depthBuckets = Set("Shallow", "Intermediate", "Deep")
    df.collect().foreach { r =>
      val v = r.getDouble(0)
      assert(magBuckets.contains(r.getString(1)), s"v=$v")
      assert(depthBuckets.contains(r.getString(2)), s"v=$v")
      // boundary semantics: bucket edges are left-inclusive on the next class
      if (v == 3.0) assert(r.getString(1) === "Minor")
      if (v == 8.0) assert(r.getString(1) === "Great")
      if (v == 70.0) assert(r.getString(2) === "Shallow")
      if (v == 300.0) assert(r.getString(2) === "Intermediate")
    }
  }

  test("property: null normalization is idempotent and only '' / '0' null out") {
    val sGen = Gen.frequency(
      5 -> Gen.asciiPrintableStr.map(_.take(12)),
      2 -> Gen.oneOf("", "0", " 0 ", "  ", "00", "0.0"),
      1 -> Gen.numStr.map(_.take(6)))
    val df = sample(sGen, 400).toDF("c")
    val once = Staging.normalizeNulls(df, Seq("c"))
    val twice = Staging.normalizeNulls(once, Seq("c"))
    assert(once.as[Option[String]].collect().toSeq ===
      twice.as[Option[String]].collect().toSeq)
    once.as[Option[String]].collect().foreach {
      case Some(v) => assert(v.trim.nonEmpty && v.trim != "0" && v == v.trim)
      case None => ()
    }
  }

  test("property: anti-join dedup is idempotent and union has unique keys") {
    val keys = sample(Gen.chooseNum(0L, 120L), 200)
    val (ex, fr) = keys.splitAt(100)
    val existing = ex.distinct.toDF("ID_Event")
    val fresh = fr.toDF("ID_Event").dropDuplicates("ID_Event")
    val d1 = OdsTransform.dedupeAgainstExisting(fresh, existing)
    val d2 = OdsTransform.dedupeAgainstExisting(d1, existing)
    assert(d1.as[Long].collect().sorted.toSeq === d2.as[Long].collect().sorted.toSeq)
    val merged = existing.unionByName(d1)
    assert(merged.count() === merged.dropDuplicates("ID_Event").count())
  }

  test("property: minhash signatures are partitioning-invariant") {
    val wordGen = Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "data", "spark")).map(_.mkString(" "))
    val docs = sample(wordGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val a = Dedup.minhashSignatures(
      docs.toDF("doc_id", "text").repartition(1), "text", "doc_id")
    val b = Dedup.minhashSignatures(
      docs.toDF("doc_id", "text").repartition(7), "text", "doc_id")
    assert(a.collect().map(_.toSeq).toSet === b.collect().map(_.toSeq).toSet)
  }

  test("property: n-gram Jaccard pairs satisfy 0 < inter <= uni and doc_a < doc_b") {
    val wordGen = Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      .map(_.mkString(" "))
    val docs = sample(wordGen, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val pairs = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
      "text", "doc_id", n = 3, thNum = 0, thDen = 1) // threshold 0: all candidates
    pairs.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (i, u) = (r.getLong(2), r.getLong(3))
      assert(a < b)
      assert(i > 0 && i <= u, s"pair=($a,$b) inter=$i uni=$u")
    }
  }

  /** Independent plain-Scala mirror of the operator's gram rules:
    * normalize → single-space split → windows `1..max(len-n+1, 1)` where a
    * short document yields one partial gram (concat_ws skips the missing
    * positions) → distinct per document.
    */
  private def scalaGrams(text: String, n: Int): Set[String] = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    val toks = norm.split(" ", -1)
    (0 until math.max(toks.length - (n - 1), 1)).map { i =>
      toks.slice(i, math.min(i + n, toks.length)).mkString(" ")
    }.toSet
  }

  test("property: n-gram Jaccard pairs match an independent set computation exactly") {
    // small vocabulary + repeated phrases force heavy gram sharing, so the
    // in-place per-bucket pair generation (sorted suffix pairing + map-side
    // partial counts) is exercised on buckets of many documents
    val wordGen = Gen.listOfN(8, Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" "))
    val docs = sample(wordGen, 30, seed = 7L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val expected = (for {
      (ai, at) <- docs; (bi, bt) <- docs if ai < bi
      ga = scalaGrams(at, 3); gb = scalaGrams(bt, 3)
      inter = (ga & gb).size if inter > 0
    } yield (ai, bi) -> (inter.toLong, (ga.size + gb.size - inter).toLong)).toMap
    val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", n = 3, thNum = 0, thDen = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
  }

  test("property: full-probe IVF equals brute force on random vectors") {
    import graft.ext.Similarity
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 10.0f))
      .suchThat(v => v.exists(_ != 0.0f))
    val emb = sample(vecGen, 50, seed = 11L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        k = 3, maxExactRows = 1000)
      .collect().map(_.toSeq).toSet
    // nprobe == nCells searches every cell — must recover the exact result
    val ivf = Similarity.ivfTopKProbed(emb, "vec_id", "embedding",
        k = 3, nCells = 7, nprobe = 7)
      .collect().map(_.toSeq).toSet
    assert(ivf === brute)
  }

  /** Independent naive BPE apply: per merge rank, repeatedly merge the
    * LEFTMOST adjacent (l, r) pair until none remains — the textbook
    * Sennrich semantics, O(n²) and obviously correct, against which the
    * production single-pass token scan is checked.
    */
  private def naiveBpe(tokens: List[String],
      merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(tokens) { case (ts, (l, r)) =>
      var cur = ts
      var i = cur.indexOfSlice(List(l, r))
      while (i >= 0) {
        cur = cur.take(i) ::: (l + r) :: cur.drop(i + 2)
        // resume AFTER the merged token: leftmost-greedy non-overlap
        val j = cur.indexOfSlice(List(l, r), i + 1)
        i = j
      }
      cur
    }

  test("property: BpeMerge single-pass token scan equals the naive " +
    "leftmost-greedy reference on random token streams and merge tables") {
    val tokGen = Gen.oneOf("a", "b", "c", "ab", "bc")
    val docGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, tokGen))
    val mergeGen = Gen.zip(Gen.oneOf("a", "b", "c", "ab"),
      Gen.oneOf("a", "b", "c", "bc"))
    val docs = sample(docGen, 120)
    val merges = sample(mergeGen, 6, seed = 7L).distinct
    val df = docs.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts.mkString(" "))
    }.toDF("doc_id", "text")
    // bypass bpeApply's char-spreading: feed the token stream directly
    // through the expression in its canonical " t1 t2 … " form
    val merged = df.select(col("doc_id"),
      org.apache.spark.sql.graftshim.shim.column(
        graft.functions.BpeMerge(
          org.apache.spark.sql.graftshim.shim.expression(
            concat(lit(" "), col("text"), lit(" "))), merges))
        .as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim).toMap
    docs.zipWithIndex.foreach { case (ts, i) =>
      val want = naiveBpe(ts, merges).mkString(" ")
      assert(merged(i.toLong) === want,
        s"doc=$ts merges=$merges")
    }
  }

  test("property: BpeMerge's boundary-factorized word cache equals the " +
    "unsegmented pass — per-word factorization is exact (no merge " +
    "token contains the boundary) and the cache never goes stale " +
    "across merge-table switches on one thread") {
    // a visible stand-in boundary ("|" appears in no merge token, which
    // is all the factorization requires; the production sentinel
    // \u0001 is <= U+0020, and String.trim in this harness would strip
    // it from the expression output but not the naive reference)
    val B = "|"
    val tokGen = Gen.oneOf("a", "b", "c", "ab", "bc", B)
    val docGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, tokGen))
    val docs = sample(docGen, 150, seed = 11L)
    val mergesA = sample(Gen.zip(Gen.oneOf("a", "b", "c", "ab"),
      Gen.oneOf("a", "b", "c", "bc")), 6, seed = 7L).distinct
    // a SECOND table on the same docs: the thread-local cache must key
    // to the table and re-derive, never serve table-A results
    val mergesB = sample(Gen.zip(Gen.oneOf("a", "b", "ab", "bc"),
      Gen.oneOf("b", "c", "a", "ab")), 5, seed = 23L).distinct
    val df = docs.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts.mkString(" "))
    }.toDF("doc_id", "text")
    def run(merges: Seq[(String, String)]): Map[Long, String] =
      df.select(col("doc_id"),
        org.apache.spark.sql.graftshim.shim.column(
          graft.functions.BpeMerge(
            org.apache.spark.sql.graftshim.shim.expression(
              concat(lit(" "), col("text"), lit(" "))), merges, B))
          .as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1).trim).toMap
    // interleave table A, table B, table A again — exercises the
    // cache's table-switch clearing within reused task threads
    val a1 = run(mergesA)
    val b1 = run(mergesB)
    val a2 = run(mergesA)
    docs.zipWithIndex.foreach { case (ts, i) =>
      // the naive reference runs over the FULL stream with the boundary
      // as an ordinary (unmergeable) token — equality proves the
      // factorization changed nothing
      val wantA = naiveBpe(ts, mergesA).mkString(" ")
      val wantB = naiveBpe(ts, mergesB).mkString(" ")
      assert(a1(i.toLong) === wantA, s"A1 doc=$ts")
      assert(b1(i.toLong) === wantB, s"B after A doc=$ts")
      assert(a2(i.toLong) === wantA, s"A after B doc=$ts")
    }
  }

  /** Independent Sennrich `learn_bpe` reference: runs over the raw word
    * OCCURRENCE stream (no frequency grouping — structurally unlike the
    * engine's word-frequency table), overlap-counts adjacent positions,
    * argmax with the count-desc/lhs-asc/rhs-asc tie-break compared BY
    * CODE POINT (UTF-8 byte order, the oracle collation — an
    * independent implementation via codePoints arrays, not the
    * engine's comparator), applies each winner with the naive greedy
    * pass. */
  private def naiveTrain(texts: Seq[String],
      nMerges: Int): Seq[(Long, String, String, Long)] = {
    var occs: Seq[List[String]] = texts
      .map(_.toLowerCase.replaceAll("\\s+", " ").trim)
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .map(w => w.codePoints().toArray.toList
        .map(cp => new String(Character.toChars(cp))))
    val cpOrd: Ordering[String] = new Ordering[String] {
      def compare(a: String, b: String): Int = {
        val xs = a.codePoints().toArray
        val ys = b.codePoints().toArray
        var i = 0
        while (i < xs.length && i < ys.length) {
          if (xs(i) != ys(i)) return Integer.compare(xs(i), ys(i))
          i += 1
        }
        Integer.compare(xs.length, ys.length)
      }
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      occs.foreach { ts =>
        ts.zip(ts.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + 1L)
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.min(
          Ordering.by[((String, String), Long), (Long, String, String)] {
            case ((l, r), c) => (-c, l, r)
          }(Ordering.Tuple3(Ordering.Long, cpOrd, cpOrd)))
        out += ((rank, l, r, c))
        occs = occs.map(ts => naiveBpe(ts, Seq((l, r))))
        rank += 1
      }
    }
    out.toSeq
  }

  test("property: bpeTrain equals the occurrence-stream Sennrich " +
    "reference on random corpora (incl. collation-diverging chars)") {
    // "" vs "😀" (U+1F600) order DIVERGES between
    // UTF-16-unit and code-point comparison — ties between them pin
    // the trainer to the oracle's binary collation
    val wordGen = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "", "😀"))
        .map(_.mkString))
    val docGen = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val texts = sample(docGen, 40, seed = 11L)
    val got = graft.ext.TextAnalysis.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", nMerges = 6)
      .orderBy("rank").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got === naiveTrain(texts, 6), s"corpus=$texts")
  }

  test("property: mergeShardStats law on random splits — " +
    "merge(sketch(A), sketch(B)) = sketch(A ∪ B), k-truncated") {
    import graft.ext.Corpus
    val rowGen = Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(-50L, 50L),
      Gen.oneOf(true, false))
    val rows = sample(rowGen, 200, seed = 23L)
    val a = rows.filter(_._3).map(t => (t._1, t._2)).toDF("sh", "v")
    val b = rows.filterNot(_._3).map(t => (t._1, t._2)).toDF("sh", "v")
    val all = rows.map(t => (t._1, t._2)).toDF("sh", "v")
    val k = 4
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("sh").collect().toSeq.map(r =>
        (r.getInt(0), r.getAs[Long]("n_rows"), r.getAs[Long]("v_min"),
          r.getAs[Long]("v_max"),
          r.getSeq[Long](r.fieldIndex("v_kmv")).toSeq))
    val direct = rowsOf(Corpus.shardStatsSketch(all, "sh", Seq("v"), k))
    val merged = rowsOf(Corpus.mergeShardStats(
      Corpus.shardStatsSketch(a, "sh", Seq("v"), k),
      Corpus.shardStatsSketch(b, "sh", Seq("v"), k), "sh", Seq("v"), k))
    assert(merged === direct)
  }
}
