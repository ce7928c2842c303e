package graft

/** Throwaway plan-inspection tool: `runMain graft.ExplainScratch <query> [sfDir]`
  * prints the formatted physical plan for one registered query. Not part of
  * the driver contract.
  */
object ExplainScratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.util.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    if (sys.env.contains("SCRATCH_EXECUTE")) {
      df.collect()
      // adaptive final plan: shows ReusedExchange / query-stage reuse
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
