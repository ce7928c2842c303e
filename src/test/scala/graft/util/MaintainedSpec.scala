package graft.util

import java.io.File

import graft.SparkSpec

class MaintainedSpec extends SparkSpec {
  import spark.implicits._

  test("table: builds once, reuses the materialized copy, rebuilds on a newer source") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-maintained").toFile
    val src = new File(tmp, "src.parquet")
    Seq((1L, "a"), (2L, "b")).toDF("id", "t").write.parquet(src.getPath)
    var builds = 0
    def get() = Maintained.table(spark, src.getPath, "spec_table") {
      builds += 1
      spark.read.parquet(src.getPath)
    }
    assert(get().count() === 2 && builds === 1)
    assert(get().count() === 2 && builds === 1) // second read: no rebuild
    // source newer than the materialized copy → rebuilt. The bump is kept in
    // the PAST-to-present window (past any fs timestamp granularity, but not
    // future-dated) so the rebuilt copy's own _SUCCESS lands newer than the
    // source and the steady state returns to reuse.
    Thread.sleep(1200) // clear 1s-granularity filesystems before the bump
    src.setLastModified(System.currentTimeMillis())
    assert(get().count() === 2 && builds === 2)
    assert(get().count() === 2 && builds === 2)
  }
}
