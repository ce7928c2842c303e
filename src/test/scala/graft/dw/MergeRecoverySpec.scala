package graft.dw

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Crash-window coverage for the MERGE swap protocol: every intermediate
  * state a kill can leave behind must recover to a complete table.
  */
class MergeRecoverySpec extends SparkSpec {

  import spark.implicits._

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeTable(path: String, ids: Seq[Long]): Unit =
    ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(path)

  private def readIds(path: String): Set[Long] =
    spark.read.parquet(path).as[Long].collect().toSet

  test("recover: no-op when target exists") {
    val t = Files.createTempDirectory("mrg").toString + "/t"
    writeTable(t, Seq(1L, 2L))
    Merge.recover(spark, t)
    assert(readIds(t) === Set(1L, 2L))
  }

  test("recover: kill between the two renames restores the complete new data") {
    val t = Files.createTempDirectory("mrg").toString + "/t"
    // state: target missing, __swap_old = previous, __swap_new = complete new
    writeTable(t + "__swap_old", Seq(1L, 2L))
    writeTable(t + "__swap_new", Seq(1L, 2L, 3L)) // has _SUCCESS
    Merge.recover(spark, t)
    assert(readIds(t) === Set(1L, 2L, 3L))
    assert(!fs(t).exists(new Path(t + "__swap_old")))
    assert(!fs(t).exists(new Path(t + "__swap_new")))
  }

  test("recover: incomplete tmp write falls back to the old copy") {
    val t = Files.createTempDirectory("mrg").toString + "/t"
    writeTable(t + "__swap_old", Seq(1L, 2L))
    writeTable(t + "__swap_new", Seq(9L))
    // simulate a mid-write kill: job never committed
    fs(t).delete(new Path(t + "__swap_new/_SUCCESS"), false)
    Merge.recover(spark, t)
    assert(readIds(t) === Set(1L, 2L))
    assert(!fs(t).exists(new Path(t + "__swap_new")))
  }

  test("atomicOverwrite after a crash window still upserts correctly") {
    val t = Files.createTempDirectory("mrg").toString + "/t"
    writeTable(t + "__swap_new", Seq(1L, 2L, 3L)) // crashed between renames
    val staged = Seq(3L, 4L).toDF("id")
    Merge.mergeInto(spark, t, staged, key = "id")
    assert(readIds(t) === Set(1L, 2L, 3L, 4L))
  }
}
