package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactParSpec extends SparkSpec {

  import spark.implicits._

  test("dsum rounds negative half-units away from zero (decimal HALF_UP parity)") {
    // exact-binary halves (eighths scale to exact .5 doubles): HALF_UP away
    // from zero -> ±0.13/±0.38; the naive floor(x*f+0.5) form rounded the
    // negatives toward +inf (-0.125 -> -0.12)
    val df = Seq(-0.125, 0.125, -0.375, 0.0).toDF("x")
    val got = df.agg(Exact.dsum($"x", 2).as("s")).head().getDouble(0)
    val viaDecimal = df
      .agg(sum($"x".cast("decimal(18,2)")).cast("double").as("s"))
      .head().getDouble(0)
    assert(got === viaDecimal)
    assert(math.abs(got - (-0.38)) < 1e-12) // -0.13 + 0.13 - 0.38 + 0
  }

  test("dsum and dsumSql stay the same arithmetic on mixed-sign values") {
    val vals = Seq(-0.125, 0.015, -2.345, 7.005, -0.0, 3.335)
    val got = vals.toDF("x").agg(Exact.dsum($"x", 2)).head().getDouble(0)
    // dsumSql's expression, evaluated by Spark: if dsum's Column form ever
    // drifts from the SQL string's arithmetic, these diverge
    val sqlForm = vals.toDF("x")
      .agg((sum((signum($"x") * floor(abs($"x") * 100 + 0.5)).cast("long"))
        .cast("double") / 100).as("s")).head().getDouble(0)
    assert(got === sqlForm)
  }

  test("dsum stays exact past 2^53 quantized units (long sum, not double)") {
    // 2^53/100 quantizes to exactly 2^53 units; ten 0.01s add 10 more units.
    // A double partial-sum starting at 2^53 drops every +1 (ulp there is 2),
    // losing 0.1 — above the output ulp (~0.016 at 9e13) — so this fails if
    // the product ever sums as DoubleType again instead of LongType.
    val big = math.pow(2, 53) / 100.0
    val df = (big +: Seq.fill(10)(0.01)).toDF("x").coalesce(1)
    val got = df.agg(Exact.dsum($"x", 2).as("s")).head().getDouble(0)
    val exact = ((1L << 53) + 10L).toDouble / 100.0
    assert(got === exact)
  }

  test("spread widens a single-partition source with sentinel stats") {
    // a localCheckpoint'd frame scans as LogicalRDD: no stats, sizeInBytes =
    // defaultSizeInBytes sentinel. This is exactly the streaming foreachBatch
    // shape — spread must widen it, not silently no-op on the huge estimate.
    val one = spark.range(0, 1000).toDF("id").repartition(1).localCheckpoint()
    assert(one.rdd.getNumPartitions === 1)
    val out = Par.spread(one)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(out.count() === 1000)
  }

  test("spread widens a narrow file scan and preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    spark.range(0, 100).toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/t")
    val scan = spark.read.parquet(s"$dir/t") // tiny file -> 1 scan partition
    val out = Par.spread(scan)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(out.count() === 100)
  }
}
