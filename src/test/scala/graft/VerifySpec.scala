package graft

import java.io.File

import org.apache.spark.sql.functions._

/** The round-7 lesson, pinned: a query that fails to BUILD must leave a
  * visible artifact, not vanish from the correctness dump.
  */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  test("dumpQueries: failed query leaves an _ERROR marker and an error row; " +
    "good queries still dump") {
    val out = java.nio.file.Files.createTempDirectory("verify_spec").toString
    val failed = Verify.dumpQueries(spark, "/unused", out, Map(
      "good" -> ((s, _) => { import s.implicits._; Seq(1, 2).toDF("v") }),
      // analysis-time failure — the exact class of error round 7 swallowed
      "broken" -> ((s, _) => { import s.implicits._;
        Seq(1).toDF("v").select(unix_micros(col("v").cast("timestamp_ntz"))) })
    ))
    assert(failed.keySet === Set("broken"))
    assert(new File(s"$out/broken/_ERROR").exists())
    assert(spark.read.parquet(s"$out/good").as[Int].collect().sorted === Array(1, 2))
    // the marker poisons the output dir: a parquet read over it must fail,
    // which is exactly how the driver's compare surfaces the query as `err`
    intercept[Exception] { spark.read.parquet(s"$out/broken").collect() }
  }
}
