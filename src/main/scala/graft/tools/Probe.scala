package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for environment checks (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    try {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      ev.printSchema()
      ev.select(col("event_id"), col("ts"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("s")).show(3, false)
    } catch { case e: Throwable => println("EVENTS FAIL: " + e.getMessage.take(400)) }
    // custom expressions smoke
    import graft.functions.VectorFunctions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.limit(2).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val r = graft.operators.ExactKnn.search(q, v, 3, "cosine")
    r.show(10, false)
    val rw = graft.operators.ExactKnn.searchWindowed(q, v, 3, "cosine")
    rw.show(10, false)
    emb.select(col("vec_id"), signPack64(col("embedding")).as("code")).show(3, false)
    spark.stop()
  }
}
