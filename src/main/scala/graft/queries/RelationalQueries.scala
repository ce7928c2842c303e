package graft.queries

import graft.util.{Exact, Tables}
import org.apache.spark.sql.functions._

/** Core relational operator-parity queries (SURVEY §2), expressed over the
  * driver's TPC-H-ish tables with a DuckDB oracle each.
  *
  * Aggregates over doubles use [[Exact]] so results are independent of
  * partitioning/AQE decisions (and therefore match a single-threaded oracle
  * at any scale).
  */
object RelationalQueries {

  /** A1/A4/P6 + partial aggregation — the flagship pricing-summary aggregate.
    * Map-side combine keeps shuffle volume at O(groups), not O(rows).
    */
  val all: Map[String, Q] = Map(
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.dsum(col("l_quantity")).as("sum_qty"),
          Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
          Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          Exact.davg(col("l_quantity")).as("avg_qty"),
          Exact.davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }))

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Exact.dsumSql("l_quantity")} AS sum_qty,
         |  ${Exact.dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
         |  ${Exact.davgSql("l_quantity")} AS avg_qty,
         |  ${Exact.davgSql("l_discount", 4)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
