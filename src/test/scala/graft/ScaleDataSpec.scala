package graft

import org.apache.spark.sql.functions._

/** The scale-probe generator must produce collision-free dense copies for
  * ANY source id range (the stride is max(id)+1, not a fixed constant) and
  * must not NPE on an empty source table.
  */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  test("scaleEvents: dense max+1 stride, distinct ids, factor x rows") {
    val src = Seq((0L, "a"), (7L, "b")).toDF("event_id", "payload")
    val out = ScaleData.scaleEvents(src, 3)
    assert(out.count() === 6)
    assert(out.select("event_id").distinct().count() === 6)
    // stride is 8 (= max+1): copies are 0,7 / 8,15 / 16,23 — dense, ordered
    assert(out.select("event_id").as[Long].collect().sorted ===
      Array(0L, 7L, 8L, 15L, 16L, 23L))
  }

  test("scaleDocuments: ids collision-free even when source ids exceed 1e8") {
    val big = 250000000L // would collide under the old fixed 1e8 stride
    val src = Seq((1L, "alpha beta"), (big, "gamma delta")).toDF("doc_id", "text")
    val out = ScaleData.scaleDocuments(src, 2)
    assert(out.count() === 4)
    assert(out.select("doc_id").distinct().count() === 4)
    // copy > 0 suffixes every word (token disjointness) AND ciphers a-z
    // (char-gram disjointness): "alpha1"'s cipher, not "alpha1" itself
    val texts = out.orderBy("doc_id").select("text").as[String].collect()
    assert(texts.take(2) === Array("alpha beta", "gamma delta"))
    val cipher = ScaleData.permAlphabet(1)
    def enc(w: String) = w.map(c =>
      if (c >= 'a' && c <= 'z') cipher(c - 'a') else c)
    assert(texts.drop(2) === Array(s"${enc("alpha")}1 ${enc("beta")}1",
      s"${enc("gamma")}1 ${enc("delta")}1"))
  }

  test("permAlphabet: deterministic bijections, distinct across copies") {
    val perms = (1 to 100).map(ScaleData.permAlphabet)
    assert(perms.forall(_.sorted == "abcdefghijklmnopqrstuvwxyz"))
    assert(perms.distinct.size === 100)
    assert(perms === (1 to 100).map(ScaleData.permAlphabet))
  }

  test("scaleEmbeddings: empty source yields empty output, no NPE") {
    val src = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(ScaleData.scaleEmbeddings(src, 5).count() === 0)
    val ev = Seq.empty[(Long, String)].toDF("event_id", "payload")
    assert(ScaleData.scaleEvents(ev, 5).count() === 0)
  }

  test("scaleEmbeddings: copy 0 unperturbed, later copies perturbed") {
    val src = Seq((3L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = ScaleData.scaleEmbeddings(src, 2)
      .orderBy("vec_id").select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    assert(out.map(_._1) === Array(3L, 7L)) // stride 4 = max+1
    assert(out(0)._2 === Seq(1.0f, 2.0f))
    assert(out(1)._2 !== Seq(1.0f, 2.0f))
  }
}
