package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 scratch probe: dump new-query results for DuckDB cross-checks
  * (not part of the library surface). */
object R6Probe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outBase = if (args.length > 2) args(2) else "/tmp/r6probe"
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
    val spark = graft.SparkEntry.applyConfigs(b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").parquet(s"$outBase/$name.parquet")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%s rows=${spark.read.parquet(s"$outBase/$name.parquet").count()} sec=$sec%.2f")
    }
    spark.stop()
  }
}
