package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s for
  * graft's native expressions (e.g. [[graft.functions.FloatDot]]).
  *
  * Spark 4 made `Column` ↔ `Expression` conversion `private[sql]`
  * (`classic.ExpressionUtils`); this one-file subpackage of
  * `org.apache.spark.sql` re-exposes exactly the two conversions, the same
  * approach third-party Spark extension libraries use.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalog-resolved location of a managed table (handles case folding and
    * qualified names, unlike `warehouse.dir + "/" + name`).
    */
  def defaultTablePath(spark: org.apache.spark.sql.SparkSession,
      table: String): String =
    spark.sessionState.catalog.defaultTablePath(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).toString
}
