package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch: measure LSH candidate recall vs brute-force pairs at a
  * threshold. Not library surface. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val thr = if (args.length > 1) args(1).toDouble else 0.45
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions._

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .filter(cosineSim(col("a_vec"), col("b_vec")) >= thr)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.lshCandidatePairs(e, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.neardupLsh(e, "vec_id", "embedding", thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"brute=${brute.size} candidates=${cand.size} lsh=${lsh.size} " +
      s"recall=${if (brute.isEmpty) 1.0 else (lsh intersect brute).size.toDouble / brute.size}")
    println(s"missed=${(brute diff lsh).toList.sorted.take(20)}")
    spark.stop()
  }
}
