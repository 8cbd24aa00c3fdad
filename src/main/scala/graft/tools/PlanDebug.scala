package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.HnswDistributed
import graft.hnsw.HnswDistributed.BuildConfig
import graft.hnsw.HnswParams
import graft.plans._

object PlanDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraStrategies = Seq(new HnswStrategy)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val model = HnswDistributed.build(vectors,
      BuildConfig(HnswParams.standard(64, 64, 16), "cosine", 42L))

    val df = HnswSql.knn(queries, model, 10)
    println("=== analyzed ===")
    println(df.queryExecution.analyzed.treeString.take(2000))
    println("=== optimized ===")
    println(df.queryExecution.optimizedPlan.treeString.take(2000))
    println("=== physical ===")
    println(df.queryExecution.executedPlan.treeString.take(2000))
    try {
      val n = df.count()
      println(s"count=$n")
    } catch { case e: Throwable => println("EXEC FAIL: " + e.getMessage.take(500)) }
    try {
      val rows = df.select("qid", "id", "rank").collect()
      println(s"select-collect=${rows.length}")
    } catch { case e: Throwable => println("SELECT FAIL: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
