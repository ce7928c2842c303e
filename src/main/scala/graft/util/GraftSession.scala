package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's scale-oriented defaults.
  *
  * Local runs use `local[N]`; on a real cluster the same configs apply
  * unchanged — AQE handles runtime re-planning (skew joins, partition
  * coalescing), and shuffle partitions are sized by the launcher, not
  * hardcoded to the 200 default.
  */
object GraftSession {

  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(graft.functions.GraftExtensions.install)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // respect the 64 MB advisory size when coalescing instead of refusing
      // to drop below default parallelism (Spark's tuning-guide-recommended
      // setting): small exchanges collapse to the few tasks their data
      // merits rather than paying cores× task-scheduling overhead per
      // stage, and at 100 TB the advisory size — not this flag — governs
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // ...but never below 8 tasks: byte-based coalescing is blind to
      // compute density, and a narrow (id, id, score) candidate stream
      // whose rows each cost a 64-dim dot product coalesced to ONE task at
      // sf1 (observed: a single thread grinding 50 M pairs for 20+ min
      // while 31 cores idled). A floor of 8 caps that hazard at 8× while
      // keeping small exchanges far under the cores× task count.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "8")
      // decouple partition SIZE from data scale: every exchange starts at
      // 256 partitions and AQE coalesces down to the 64 MB advisory size,
      // so sf0.1 plans keep their few-task shape while a 100x corpus gets
      // 100x the reducers instead of 100x the partition size (the fixed
      // cpus-sized count spilled the big gram shuffles — measured on the
      // sf10 probe, BASELINE.md round-10 100x section). On a real cluster
      // the launcher raises this with the executor count.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-mode heartbeats (executor == driver) only exist to be missed
      // under full-core load; see Bench for the observed eviction cascade
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "800s")
      .config("spark.sql.session.timeZone", "UTC")
      // driver testdata stores TIMESTAMP(NANOS) which Spark's parquet reader
      // rejects; read as long and convert in Tables (truncation to micros,
      // matching DuckDB's own ns→us handling)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Reads the driver's per-scale-factor parquet tables, canonicalizing
  * nanosecond timestamps (read as long via `nanosAsLong`) back to
  * TimestampType by truncation to microseconds — the same conversion DuckDB
  * applies, so oracle comparisons stay exact.
  */
object Tables {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.LongType

  private val TimestampCols = Set("ts")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (acc, f) if TimestampCols(f.name) && f.dataType == LongType =>
        acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      case (acc, _) => acc
    }
  }
}
