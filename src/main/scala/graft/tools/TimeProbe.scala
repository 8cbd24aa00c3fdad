package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch query timer (not part of the library surface): times named
  * SparkEntry queries with the Bench session shape, n reps each. Usage:
  * runMain graft.tools.TimeProbe <sfDir> <reps> <query>... */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else graft.SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach { t =>
        try spark.read.parquet(s"$dir/$t.parquet")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
