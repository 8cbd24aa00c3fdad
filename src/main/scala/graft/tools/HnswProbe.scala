package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.HnswDistributed
import graft.hnsw.HnswDistributed.BuildConfig
import graft.hnsw.HnswParams
import graft.operators.ExactKnn

/** Scratch: build HNSW on a testdata sf dir, report recall@k vs the exact
  * oracle, self-match rate, and build/search timing. Not library surface. */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val efC = if (args.length > 1) args(1).toInt else 64
    val efS = if (args.length > 2) args(2).toInt else 64
    val m = if (args.length > 3) args(3).toInt else 16
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val t0 = System.nanoTime()
    val model = HnswDistributed.build(vectors,
      BuildConfig(HnswParams.standard(efC, efS, m), "cosine", seed = 42L))
    val tBuild = (System.nanoTime() - t0) / 1e9
    println(f"BUILD n=${model.size} layers=${model.snapshot.numLayers} edges=${model.snapshot.edgeCount} t=$tBuild%.2fs")

    val k = 10
    val t1 = System.nanoTime()
    val hnsw = HnswDistributed.search(queries, model, k)
      .select(col("qid"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tSearch = (System.nanoTime() - t1) / 1e9
    val exact = ExactKnn.search(queries, vectors, k, "cosine")
      .select(col("qid"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (hnsw intersect exact).size.toDouble / exact.size
    println(f"RECALL@$k = $recall%.4f  (hnsw=${hnsw.size} exact=${exact.size}) search t=$tSearch%.2fs")
    val exactOnly = (exact diff hnsw).size
    println(s"identical_sets=${hnsw == exact} missing=$exactOnly")

    val sm = HnswDistributed.selfMatch(vectors, model, 1e-6)
    val n = sm.count(); val matched = sm.filter(col("matched")).count()
    println(s"SELFMATCH $matched/$n")
    spark.stop()
  }
}
