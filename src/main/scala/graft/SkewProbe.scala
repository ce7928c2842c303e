package graft

import graft.util.Skew
import org.apache.spark.sql.functions._

/** Measured skew demonstration for the source-keyed join paths (x69's
  * scaladoc names mega-domain skew "AQE skew-join territory" — this probe
  * proves the claim with numbers instead of asserting it).
  *
  * Fixture: `SPARK_GRAFT_SKEW_ROWS` rows (default 4M) where ONE source
  * ("megadomain") holds 50% of the corpus and the rest spread over 37
  * domains — the canonical mega-domain shape. The probed operation is the
  * stats-join-back (docs ⋈ per-source stats on `source`), the step that
  * concentrates 50% of all rows on one reducer when the stats side is too
  * big to broadcast (broadcast is disabled here to model that regime).
  *
  * Three timed variants on identical data:
  *   1. plain shuffled join, AQE skew-split OFF — the straggler baseline;
  *   2. the same join with AQE skew-split ON, the stats side read from a
  *      materialized table — the first-line production answer (AQE CANNOT
  *      split when the stats aggregate runs inside the same query: the
  *      final HashAggregate between shuffle stage and join breaks
  *      OptimizeSkewedJoin's pattern — asserted in PlanAuditSpec — which
  *      is exactly the "skewed aggregate feeding a join" case the
  *      [[graft.util.Skew]] scaladoc names);
  *   3. [[graft.util.Skew.saltedJoin]] (salt=32), AQE skew OFF — the
  *      manual fallback for shapes AQE does not reach.
  * All three are checksummed to prove identical results.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.range(n).select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, lit("megadomain"))
          .otherwise(concat(lit("s"), col("id") % 37)).as("source"),
        md5(col("id").cast("string")).as("payload"))
      .persist()
    docs.count() // materialize the fixture outside the timings

    def stats = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), max(length(col("payload"))).as("max_len"))

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val out = mk
      // checksum action: forces every joined row through one aggregate
      val chk = out.agg(
        count(lit(1)).as("rows"),
        bit_xor(xxhash64(col("doc_id"), col("source"), col("n_docs"))).as("chk"))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skewprobe] $label%-28s ${dt}%7.2f s  rows=${chk.getLong(0)}  chk=${chk.getLong(1)}")
      chk.getLong(1)
    }

    def withConf(pairs: (String, String)*)(body: => Long): Long = {
      val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // stats as a maintained table (the x69 production shape) — also what
    // makes the join AQE-splittable; the in-query agg variant is the
    // shape AQE cannot reach (see scaladoc)
    val statsDir = java.nio.file.Files.createTempDirectory("skewstats").toString
    stats.write.mode("overwrite").parquet(statsDir)
    def statsTbl = spark.read.parquet(statsDir)

    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val c1 = withConf(noBroadcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      time("plain SMJ, skew-split OFF")(docs.join(statsTbl, Seq("source")))
    }
    val c2 = withConf(noBroadcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4MB") {
      time("SMJ + AQE skew-split")(docs.join(statsTbl, Seq("source")))
    }
    val c3 = withConf(noBroadcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      time("saltedJoin(salt=32)")(
        Skew.saltedJoin(docs, statsTbl, Seq("source"), salt = 32))
    }
    require(c1 == c2 && c2 == c3, "variants must produce identical rows")
    println("[skewprobe] checksums identical across all three variants")
    spark.stop()
  }
}
