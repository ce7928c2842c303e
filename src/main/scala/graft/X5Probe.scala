package graft

import graft.ext.{Dedup, TextAnalysis}
import graft.util.Par
import org.apache.spark.sql.functions._

/** Throwaway stage-attribution probe for x5 (n-gram Jaccard): times the
  * gram-stream map pass, the gram groupBy, and the full operator
  * separately so the sf1 gap can be attributed before optimizing. Not part
  * of the driver contract.
  */
object X5Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = graft.util.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[x5probe] $tag rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    val n = 3
    val ngAll = Par.spread(docs)
      .select(col("doc_id").as("_id"), TextAnalysis.tokens(col("text")).as("_t"))
      .select(col("_id"), explode(array_distinct(Dedup.wordNgrams(col("_t"), n))).as("_gs"))
      .select(col("_id"), xxhash64(col("_gs")).as("_g"))
    time("gram stream (map only)") {
      ngAll.write.format("noop").mode("overwrite").save()
    }
    time("tokens only") {
      Par.spread(docs)
        .select(col("doc_id").as("_id"), TextAnalysis.tokens(col("text")).as("_t"))
        .write.format("noop").mode("overwrite").save()
    }
    time("grams no distinct") {
      Par.spread(docs)
        .select(col("doc_id").as("_id"), explode(Dedup.wordNgrams(TextAnalysis.tokens(col("text")), n)).as("_gs"))
        .write.format("noop").mode("overwrite").save()
    }
    time("gram groupBy collect_list") {
      ngAll.groupBy(col("_g")).agg(collect_list(col("_id")).as("_ids"))
        .filter(size(col("_ids")) <= 1000)
        .write.format("noop").mode("overwrite").save()
    }
    time("full x5") {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, thNum = 3, thDen = 5)
        .write.format("noop").mode("overwrite").save()
    }
    val grouped = ngAll.groupBy(col("_g"))
      .agg(collect_list(col("_id")).as("_ids"))
      .filter(size(col("_ids")) <= 1000)
      .select(array_sort(col("_ids")).as("_ids"))
    time("inter: struct pairs + count") {
      grouped
        .select(explode(flatten(transform(col("_ids"), (a, i) =>
          transform(slice(col("_ids"), i + lit(2), size(col("_ids")) - i - lit(1)),
            b => struct(a.as("doc_a"), b.as("doc_b")))))).as("_p"))
        .groupBy(col("_p.doc_a").as("doc_a"), col("_p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .write.format("noop").mode("overwrite").save()
    }
    time("inter: packed-long pairs + count") {
      grouped
        .select(explode(flatten(transform(col("_ids"), (a, i) =>
          transform(slice(col("_ids"), i + lit(2), size(col("_ids")) - i - lit(1)),
            b => shiftleft(a, 32).bitwiseOR(b))))).as("_p"))
        .groupBy(col("_p"))
        .agg(count(lit(1)).as("inter"))
        .write.format("noop").mode("overwrite").save()
    }
    time("pair volume (count only)") {
      println("pairs: " + grouped
        .select(explode(flatten(transform(col("_ids"), (a, i) =>
          transform(slice(col("_ids"), i + lit(2), size(col("_ids")) - i - lit(1)),
            b => shiftleft(a, 32).bitwiseOR(b))))).as("_p")).count())
    }
    spark.stop()
  }
}
