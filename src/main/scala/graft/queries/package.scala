package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver-contract query shape: (session, sf-dir) → result frame. */
  type Q = (SparkSession, String) => DataFrame
}
