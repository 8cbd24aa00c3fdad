package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan auditor: prints the formatted physical plan of named
  * SparkEntry queries (not part of the library surface). Usage:
  * runMain graft.tools.PlanProbe <sfDir> <query>... */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
