package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integration test: the full training-data curation flow as one
  * composition — language filter → exact dedup → near-dup cluster dedup →
  * context-window chunking — asserting the row flow end to end. Each stage
  * is oracle-verified individually (x9, x1, x21/x29/x34, x38); this spec
  * checks they compose.
  */
class CurationPipelineSpec extends SparkSpec {

  import spark.implicits._

  test("curation flow: filter, dedup, cluster-dedup, chunk") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away tonight"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away tonight"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog and runs far away today"),   // near-dup of 1
      (4L, "el rapido zorro marron salta sobre el perro perezoso y se va lejos"),    // non-English
      (5L, "an entirely different english document about the spark engines and shuffles in it")
    ).toDF("doc_id", "text")

    // 1. language filter (x9 semantics)
    val english = docs.filter(TextAnalysis.langId(col("text")) === "en")
    assert(english.select("doc_id").as[Long].collect().sorted === Array(1L, 2L, 3L, 5L))

    // 2. exact dedup: min-id survivor per canonical text (x1)
    val exact = Dedup.exact(english, "text", "doc_id")
    assert(exact.select("doc_id").as[Long].collect().sorted === Array(1L, 3L, 5L))

    // 3. near-dup clusters over the survivors, canonical kept (x21 → x34)
    val pairs = Dedup.simhashNearDups(exact, "text", "doc_id",
      bits = 48, bands = 4, maxHam = 6)
    val curated = Dedup.dedupByClusters(exact, "doc_id", pairs)
    assert(curated.select("doc_id").as[Long].collect().sorted === Array(1L, 5L))

    // 4. chunk the curated corpus (x38); every curated doc contributes ≥ 1
    // chunk and every chunk's tokens come from its document
    val chunked = curated.select(col("doc_id"),
      posexplode(TextAnalysis.chunks(col("text"), 8, 2)).as(Seq("_pos", "chunk")))
    val perDoc = chunked.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perDoc.keySet === Set(1L, 5L))
    assert(perDoc.values.forall(_ >= 2)) // 13-14 tokens, window 8 stride 6
    val reassembled = chunked.filter(col("_pos") === 0)
      .select(col("doc_id"), split(col("chunk"), " ").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reassembled(1L).take(4) === Seq("the", "quick", "brown", "fox"))
  }
}
