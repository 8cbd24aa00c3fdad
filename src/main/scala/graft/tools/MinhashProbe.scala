package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the minhash near-dup pipeline. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    println("docs partitions: " + d.rdd.getNumPartitions + " rows " + d.count())
    val banded = d.repartition(32).select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.md5MinHashShingles(
        col("text"), 8, 12, 4, 3)).as(Seq("band_idx", "band_val")))
    time("kernel pass (noop)") {
      banded.write.format("noop").mode("overwrite").save()
    }
    val bandedC = banded.cache()
    time("cache fill") { bandedC.count() }
    val cand = bandedC.as("x").join(bandedC.as("y"),
      col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()
    time("cand") { println("cand rows: " + cand.count()) }
    val full = graft.queries.DedupQueries.defs("d_neardup_minhash")(spark, dir)
    time("full query") { full.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
