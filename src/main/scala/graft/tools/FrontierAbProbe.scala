package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{GraphFrames, HnswDistributed, HnswFrontier, HnswParams}
import graft.hnsw.HnswDistributed.BuildConfig

/** Interleaved same-JVM A/B for the frontier-loop cache layout
  * (-Dgraft.frontier.prepart): arm A = round-18 unpartitioned caches,
  * arm B = pre-partitioned + pre-sorted caches. Alternates BABA x trials
  * over one shared built model so weather drift hits both arms equally
  * (the graft-bench-weather-discipline protocol). */
object FrontierAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cfg = BuildConfig(
      HnswParams.standard(efConstruction = 64, efSearch = 128, m = 16),
      metric = "cosine", seed = 42L)
    val model = HnswDistributed.buildCached(vectors, cfg, sfDir)
    val links = GraphFrames.toLinksDF(spark, model.snapshot)
    val upper = HnswFrontier.upperSnapshot(model.snapshot)

    def serve(prepart: Boolean): Double = {
      System.setProperty("graft.frontier.prepart", prepart.toString)
      val t0 = System.nanoTime()
      HnswFrontier.search(links, upper, vectors, queries, k = 10, ef = 128)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    serve(prepart = false) // warm both code paths once, discarded
    serve(prepart = true)
    val a = Array.newBuilder[Double]; val b = Array.newBuilder[Double]
    (1 to trials).foreach { i =>
      val tb = serve(prepart = true); val ta = serve(prepart = false)
      println(f"trial $i: prepart $tb%.2f s  flat $ta%.2f s")
      b += tb; a += ta
    }
    println(f"min-of-$trials: prepart ${b.result().min}%.2f s  flat ${a.result().min}%.2f s")
    spark.stop()
  }
}
