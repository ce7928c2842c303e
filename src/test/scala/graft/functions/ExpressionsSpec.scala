package graft.functions

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Unit coverage for graft's native Catalyst expressions — both the
  * interpreted (`eval`) and whole-stage-codegen (DataFrame) paths, checked
  * against independent reimplementations of their contracts.
  */
class ExpressionsSpec extends SparkSpec {

  private def fold(x: Seq[Float], y: Seq[Float]): Double =
    x.zip(y).foldLeft(0.0) { case (acc, (a, b)) => acc + a.toDouble * b.toDouble }

  test("FloatDot: codegen path matches sequential double fold") {
    import spark.implicits._
    val x = Seq(1.5f, -2.25f, 0.125f, 3.75f)
    val y = Seq(0.5f, 4.0f, -8.0f, 0.0625f)
    val df = Seq((x, y)).toDF("a", "b")
    val got = df.select(
      shim.column(FloatDot(shim.expression(col("a")), shim.expression(col("b"))))
        .as("d")).head().getDouble(0)
    assert(got === fold(x, y))
  }

  test("FloatDot: interpreted eval matches, ragged arrays use min length, null in → null out") {
    val lit3 = Literal(new GenericArrayData(Array(1.0f, 2.0f, 3.0f)),
      ArrayType(FloatType))
    val lit2 = Literal(new GenericArrayData(Array(10.0f, 20.0f)),
      ArrayType(FloatType))
    assert(FloatDot(lit3, lit2).eval(null) === (1.0 * 10.0 + 2.0 * 20.0))
    val nul = Literal.create(null, ArrayType(FloatType))
    assert(FloatDot(lit3, nul).eval(null) === null)
  }

  test("FloatDot: accumulation order is left-to-right (not pairwise/reordered)") {
    // Catastrophic-cancellation probe: result differs between fold orders.
    val x = Seq(1e8f, 1.0f, -1e8f, 1.0f)
    val y = Seq(1.0f, 1.0f, 1.0f, 1.0f)
    val lit = (s: Seq[Float]) =>
      Literal(new GenericArrayData(s.toArray), ArrayType(FloatType))
    assert(FloatDot(lit(x), lit(y)).eval(null) === fold(x, y))
  }

  /** Oracle-mirror reimplementation: CAST('0x'||substr(md5hex, 1+8s, 8)). */
  private def hexSlices(s: String, groups: Int): Seq[Long] =
    (0 until groups).flatMap { g =>
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$g|$s".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      (0 until 4).map(i => java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16))
    }

  test("Md5Slices: matches the hex-substring oracle formula") {
    for (input <- Seq("abcde", "", "héllo wörld", "x" * 100); groups <- Seq(1, 2, 4)) {
      val got = Md5Slices.slices(UTF8String.fromString(input), groups)
        .toLongArray().toSeq
      assert(got === hexSlices(input, groups), s"input=$input groups=$groups")
    }
  }

  test("Md5Slices: codegen path via DataFrame matches eval path") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "jumps").toDF("s")
    val rows = df.select(col("s"),
      shim.column(Md5Slices(shim.expression(col("s")), 2)).as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === hexSlices(r.getString(0), 2))
    }
  }

  test("CmsPairs: equals Md5Slices over the materialized gram strings, " +
    "partial-gram tail included; depth > 4 spills to the next digest") {
    def reference(text: String, n: Int, depth: Int, width: Int): Seq[Long] = {
      val toks = text.split(" ", -1)
      val m = math.max(toks.length - n + 1, 1)
      (0 until m).flatMap { g =>
        val gram = toks.slice(g, math.min(g + n, toks.length)).mkString(" ")
        val sl = Md5Slices.slices(UTF8String.fromString(gram),
          (depth + 3) / 4).toLongArray()
        (0 until depth).map(r => (r.toLong << 32) | (sl(r) % width))
      }
    }
    for {
      text <- Seq("a b c d e", "a b", "single", "", "x y z")
      n <- Seq(2, 3); depth <- Seq(4, 6); width <- Seq(64, 131072)
    } {
      val got = CmsPairs.pairs(UTF8String.fromString(text), n, depth, width)
        .toLongArray().toSeq
      assert(got === reference(text, n, depth, width),
        s"text='$text' n=$n depth=$depth width=$width")
    }
    // codegen path via DataFrame matches eval
    import spark.implicits._
    val rows = Seq("the quick brown fox", "jumps").toDF("s")
      .select(col("s"), shim.column(CmsPairs(
        shim.expression(col("s")), 3, 4, 8192)).as("p")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === reference(r.getString(0), 3, 4, 8192))
    }
  }

  test("GramHashes: equals the xxhash64-over-distinct-gram-strings " +
    "reference, sorted; partial tail gram; codegen path") {
    import spark.implicits._
    def reference(text: String, n: Int): Seq[Long] = {
      val toks = text.split(" ", -1)
      val m = math.max(toks.length - n + 1, 1)
      (0 until m).map(g =>
          toks.slice(g, math.min(g + n, toks.length)).mkString(" "))
        .distinct
        .map(s => org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBytes("UTF-8"),
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            s.getBytes("UTF-8").length, 42L))
        .sorted
    }
    for (text <- Seq("a b c d e", "a b a b a b", "ab", "", "x y x y z");
         n <- Seq(2, 3, 8)) {
      val got = GramHashes.hashes(UTF8String.fromString(text), n)
        .toLongArray().toSeq
      assert(got === reference(text, n), s"text='$text' n=$n")
    }
    // and against Spark's own xxhash64 Column function end-to-end
    val viaColumns = Seq("the quick brown fox jumps").toDF("s")
      .select(explode(array_distinct(graft.ext.Dedup.wordNgrams(
        split(col("s"), " "), 3))).as("g"))
      .select(xxhash64(col("g"))).as[Long].collect().sorted.toSeq
    val viaFused = Seq("the quick brown fox jumps").toDF("s")
      .select(explode(shim.column(GramHashes(
        shim.expression(col("s")), 3)))).as[Long].collect().toSeq
    assert(viaFused === viaColumns)
  }

  test("GramMd5Sixty: equals conv(substring(md5(gram),1,15),16,10) over " +
    "the distinct gram strings, sorted") {
    import spark.implicits._
    for (text <- Seq("a b c d e", "a b a b a b", "ab", "", "x y z");
         n <- Seq(3, 5)) {
      val reference = {
        val toks = text.split(" ", -1)
        val m = math.max(toks.length - n + 1, 1)
        (0 until m).map(g =>
            toks.slice(g, math.min(g + n, toks.length)).mkString(" "))
          .distinct.map { s =>
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(s.getBytes("UTF-8"))
            java.lang.Long.parseLong(
              d.map("%02x".format(_)).mkString.substring(0, 15), 16)
          }.sorted
      }
      val got = GramMd5Sixty.hashes(UTF8String.fromString(text), n)
        .toLongArray().toSeq
      assert(got === reference, s"text='$text' n=$n")
    }
    // end-to-end against the Column chain
    val viaColumns = Seq("the quick brown fox jumps over").toDF("s")
      .select(explode(array_distinct(graft.ext.Dedup.wordNgrams(
        split(col("s"), " "), 5))).as("g"))
      .select(conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"))
      .as[Long].collect().sorted.toSeq
    val viaFused = Seq("the quick brown fox jumps over").toDF("s")
      .select(explode(shim.column(GramMd5Sixty(
        shim.expression(col("s")), 5)))).as[Long].collect().toSeq
    assert(viaFused === viaColumns)
  }

  test("GraftExtensions: expressions callable from SQL text") {
    val d = spark.sql(
      "SELECT float_dot(array(cast(1.5 as float), cast(2.0 as float)), " +
        "array(cast(2.0 as float), cast(0.25 as float))) AS d").head().getDouble(0)
    assert(d === (1.5 * 2.0 + 2.0 * 0.25))
    val hs = spark.sql("SELECT md5_slices('abcde', 2) AS h").head().getSeq[Long](0)
    assert(hs === hexSlices("abcde", 2))
  }

  test("Md5Slices: values are unsigned 32-bit range") {
    val got = Md5Slices.slices(UTF8String.fromString("range-check"), 4).toLongArray()
    assert(got.forall(v => v >= 0L && v <= 0xffffffffL))
  }

  test("FloatDot: double and mixed float/double arrays, codegen path") {
    import spark.implicits._
    val xf = Seq(1.5f, -2.25f, 0.125f)
    val yd = Seq(0.5, 4.0, -8.0)
    val expected = xf.zip(yd).foldLeft(0.0) { case (acc, (a, b)) => acc + a.toDouble * b }
    val df = Seq((xf, yd)).toDF("f", "d")
    def dot(a: String, b: String): Double = df.select(
      shim.column(FloatDot(shim.expression(col(a)), shim.expression(col(b))))
        .as("v")).head().getDouble(0)
    assert(dot("f", "d") === expected)       // mixed
    assert(dot("d", "f") === expected)       // mixed, flipped
    assert(dot("d", "d") === yd.map(v => v * v).sum) // pure double
  }

  test("FloatDot: int arrays (quantized codes) exact, mixed with double") {
    import spark.implicits._
    val q = Seq(127, -128, 3)
    val d = Seq(0.5, 2.0, -1.0)
    val df = Seq((q, d)).toDF("q", "d")
    def dot(a: String, b: String): Double = df.select(
      shim.column(FloatDot(shim.expression(col(a)), shim.expression(col(b))))
        .as("v")).head().getDouble(0)
    assert(dot("q", "q") === q.map(v => v.toDouble * v).sum)
    assert(dot("q", "d") === q.zip(d).map { case (a, b) => a * b }.sum)
  }

  /** Oracle-mirror reimplementation of the SimHash hash family: top bit of
    * hex nibble i of md5(t) ++ md5("1|"+t), packed at position 48 - (i+1).
    */
  private def simhashMaskOracle(s: String): Long = {
    def hex(x: String) = MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val nibbles = (hex(s) + hex("1|" + s)).take(48)
    nibbles.zipWithIndex.foldLeft(0L) { case (m, (c, i)) =>
      if ("89abcdef".contains(c)) m | (1L << (47 - i)) else m
    }
  }

  test("MinhashSigs: equals min of Md5Slices over the shingle multiset") {
    for (input <- Seq("abcdefghij", "abc", "", "héllo wörld again", "x" * 40);
         n <- Seq(3, 5); groups <- Seq(1, 2)) {
      val positions = math.max(input.length - (n - 1), 1)
      val shingles = (1 to positions).map(p =>
        input.substring(p - 1, math.min(p - 1 + n, input.length)))
      val expected = shingles
        .map(sh => Md5Slices.slices(UTF8String.fromString(sh), groups).toLongArray())
        .reduce((a, b) => a.zip(b).map { case (x, y) => math.min(x, y) })
      val got = MinhashSigs.sigs(UTF8String.fromString(input), groups, n)
        .toLongArray()
      assert(got.toSeq === expected.toSeq, s"input=$input n=$n groups=$groups")
    }
  }

  test("SimhashFp: equals per-token mask vote aggregation, eval/codegen/SQL") {
    import spark.implicits._
    def oracle(s: String, bits: Int): Long = {
      val toks = s.split(" ", -1)
      val votes = (1 to bits).map { i =>
        toks.count(t => ((simhashMaskOracle(t) >> (48 - i)) & 1L) != 0L) * 2 - toks.length
      }
      votes.zipWithIndex.foldLeft(0L) { case (f, (v, idx)) =>
        if (v >= 0) f | (1L << (bits - idx - 1)) else f
      }
    }
    for (s <- Seq("one two three two", "", "solo", "a b a b a"); bits <- Seq(32, 48)) {
      assert(SimhashFp.fp(UTF8String.fromString(s), bits) === oracle(s, bits), s"s=$s bits=$bits")
    }
    val viaDf = Seq("one two three two").toDF("s")
      .select(shim.column(SimhashFp(shim.expression(col("s")), 48)).as("f"))
      .head().getLong(0)
    assert(viaDf === oracle("one two three two", 48))
    val viaSql = spark.sql("SELECT simhash_fp('one two three two', 48) AS f")
      .head().getLong(0)
    assert(viaSql === oracle("one two three two", 48))
    val sigSql = spark.sql("SELECT minhash_sigs('abcdefghij', 2, 5) AS s")
      .head().getSeq[Long](0)
    assert(sigSql === MinhashSigs.sigs(UTF8String.fromString("abcdefghij"), 2, 5)
      .toLongArray().toSeq)
  }

  test("HashedLinearSum: matches the independent md5-slice oracle, " +
    "empty input is one empty token, multibyte tokens hash whole") {
    import spark.implicits._
    def w(salt: String, t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$t".getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    def oracle(salt: String, s: String): Seq[Long] = {
      val toks = s.split(" ", -1).toSeq
      Seq(toks.map(w(salt, _)).sum, toks.size.toLong)
    }
    for (s <- Seq("one two three", "", "solo", "héllo wörld", "a  b")) {
      assert(HashedLinearSum.sumAndCount(UTF8String.fromString(s), "clf")
        .toLongArray().toSeq === oracle("clf", s), s"s=[$s]")
    }
    // codegen path via DataFrame + the SQL registration
    val viaDf = Seq("one two three").toDF("s")
      .select(shim.column(HashedLinearSum(shim.expression(col("s")), "clf")).as("a"))
      .head().getSeq[Long](0)
    assert(viaDf === oracle("clf", "one two three"))
    val viaSql = spark.sql("SELECT hashed_linear_sum('one two three', 'clf') AS a")
      .head().getSeq[Long](0)
    assert(viaSql === oracle("clf", "one two three"))
    // salt changes the weights
    assert(HashedLinearSum.sumAndCount(UTF8String.fromString("x"), "other")
      .toLongArray()(0) !== w("clf", "x"))
  }

  test("SimhashBits: matches the hex-nibble oracle formula, eval and codegen") {
    import spark.implicits._
    val inputs = Seq("token", "", "héllo", "x" * 64)
    inputs.foreach { s =>
      assert(SimhashBits.mask(UTF8String.fromString(s)) === simhashMaskOracle(s), s)
    }
    val rows = inputs.toDF("s").select(col("s"),
      shim.column(SimhashBits(shim.expression(col("s")))).as("m")).collect()
    rows.foreach(r => assert(r.getLong(1) === simhashMaskOracle(r.getString(0))))
    val sql = spark.sql("SELECT simhash_bits('token') AS m").head().getLong(0)
    assert(sql === simhashMaskOracle("token"))
  }
}
