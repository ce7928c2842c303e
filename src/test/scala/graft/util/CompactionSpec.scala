package graft.util

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Small-file compaction: content preserved bit-for-bit, file count sized
  * off the on-disk footprint, already-compact dirs untouched, sorted
  * variant clusters by the scan key.
  */
class CompactionSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("compact").toString
    Files.delete(java.nio.file.Paths.get(d))
    d
  }

  private def dataFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("compact: many small files -> few, rows and schema identical") {
    val dir = freshDir()
    val df = (1L to 5000L).map(i => (i, s"row $i")).toDF("id", "v")
    df.repartition(40).write.parquet(dir) // simulate 40 tiny appends
    assert(dataFiles(dir).size === 40)
    val (before, after) = Compaction.compact(spark, dir, targetBytes = 1L << 20)
    assert(before === 40 && after < 40)
    assert(dataFiles(dir).size === after)
    val back = spark.read.parquet(dir)
    assert(back.as[(Long, String)].collect().toSet ===
      df.as[(Long, String)].collect().toSet)
  }

  test("compact: a directory already at the target is left untouched") {
    val dir = freshDir()
    (1L to 10L).toDF("id").coalesce(1).write.parquet(dir)
    val names = dataFiles(dir).map(_.getName).toSet
    val (before, after) = Compaction.compact(spark, dir)
    assert(before === 1 && after === 1)
    assert(dataFiles(dir).map(_.getName).toSet === names) // no rewrite
  }

  test("compact with sortCols: output is range-clustered by the scan key") {
    val dir = freshDir()
    (1L to 4000L).map(i => (i, i % 97)).toDF("id", "k")
      .repartition(30).write.parquet(dir)
    val (_, after) = Compaction.compact(spark, dir,
      targetBytes = 32L << 10, sortCols = Seq("id"))
    assert(after > 1) // the clustering claim needs >1 file to mean anything
    // per-file id ranges must not overlap: range partition + sort-within
    val ranges = dataFiles(dir).map { f =>
      val one = spark.read.parquet(f.getAbsolutePath).agg(
        min(col("id")), max(col("id"))).head()
      (one.getLong(0), one.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
    assert(spark.read.parquet(dir).count() === 4000L)
  }
}
