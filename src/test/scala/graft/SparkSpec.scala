package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for Spark-backed specs (one JVM-wide session;
  * cheap to getOrCreate per suite). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkEntry.applyConfigs(
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def sfDir: String = "/root/testdata/sf0.001"
}
