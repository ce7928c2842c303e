package graft

import graft.util.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared suite base: one session per forked test JVM (getOrCreate reuses). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)

  def resource(name: String): String =
    getClass.getResource(s"/$name").getPath
}
