package graft.ext

import graft.SparkSpec

/** Semantic decontamination: verdicts against hand-computed cosines,
  * every-corpus-row output (verdict-not-filter), and the no-eval-in-cell
  * null-match case.
  */
class SemanticDecontamSpec extends SparkSpec {

  import spark.implicits._

  test("flags near-copies of eval vectors; clean rows keep null match") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // exact copy of eval 100
      (2L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),   // cos 0.6 to eval 100 — above 0.45
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f))    // orthogonal to every eval
    ).toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, eval,
      "vec_id", "embedding", nCells = 1, nprobe = 1, threshold = 0.45)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    assert(out.size === 3, "every corpus row is in the output")
    assert(out(1L) === ((Some(100L), Some(1.0), true)))
    // vec 2: cos 0.6 to eval 100 wins over cos 0.8 to eval 101? No —
    // max cosine is 0.8 (eval 101): struct max picks the larger cosine
    assert(out(2L)._1 === Some(101L) && out(2L)._3 === true)
    assert(math.abs(out(2L)._2.get - 0.8) < 1e-6) // float-quantized inputs
    // orthogonal row still pairs within the single cell: max cosine 0.0
    // (tie across evals -> larger eval id), below threshold -> clean
    assert(out(3L) === ((Some(101L), Some(0.0), false)))
  }

  test("a corpus cell with no eval probe yields null match, not a guess") {
    // seeds = 2 smallest-id corpus vectors (axes 1 and 2); vec 3 lands in
    // cell 2; the single eval probes only cell 1 at nprobe=1
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.9f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val eval = Seq((100L, Seq(0.9f, 0.1f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, eval,
      "vec_id", "embedding", nCells = 2, nprobe = 1, threshold = 0.45)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getBoolean(3))).toMap
    assert(out(1L)._1 === Some(100L) && out(1L)._2 === true)
    assert(out(2L) === ((None, false)))
    assert(out(3L) === ((None, false)))
    // nprobe=2 closes the boundary miss: eval now probes both cells
    val probed = Similarity.semanticContamination(corpus, eval,
      "vec_id", "embedding", nCells = 2, nprobe = 2, threshold = 0.45)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(probed(2L).isDefined && probed(3L).isDefined)
  }

  test("threshold compare is inclusive (>=)") {
    val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val eval = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, eval,
      "vec_id", "embedding", nCells = 1, nprobe = 1, threshold = 1.0)
      .collect()
    assert(out.head.getBoolean(3) === true)
  }
}
