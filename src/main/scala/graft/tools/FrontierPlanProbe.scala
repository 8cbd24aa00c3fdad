package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.hnsw.{GraphFrames, HnswDistributed, HnswParams}
import graft.hnsw.HnswDistributed.BuildConfig

/** One-shot plan dump of a frontier ROUND's join pipeline with flat vs
  * pre-partitioned caches — verifies whether the cached side's exchange
  * and sort are actually elided by the sort-merge join. */
object FrontierPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val np = spark.sparkContext.defaultParallelism

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cfg = BuildConfig(
      HnswParams.standard(efConstruction = 64, efSearch = 128, m = 16),
      metric = "cosine", seed = 42L)
    val model = HnswDistributed.buildCached(vectors, cfg, sfDir)
    val links = GraphFrames.toLinksDF(spark, model.snapshot)

    for (prepart <- Seq(false, true)) {
      def keyed(df: org.apache.spark.sql.DataFrame, key: String) =
        if (prepart) df.repartition(np, col(key)).sortWithinPartitions(key) else df
      val layer0 = keyed(links.filter(col("layer") === 0)
        .select(col("src"), col("links")), "src").cache()
      val vecs = keyed(vectors.select(col("id"), col("vec")), "id").cache()
      layer0.count(); vecs.count()
      val frontier = queries.select(col("qid"), col("qid").as("id")).limit(500)
        .localCheckpoint()
      val discovered = frontier
        .join(layer0, frontier("id") === layer0("src"))
        .select(col("qid"), explode(col("links")).as("e"))
        .select(col("qid"), col("e.dst").as("id"))
        .distinct()
      val scored = discovered.join(vecs, "id")
        .select(col("qid"), col("id"), lit(0.0).as("dist"))
      val ranked = scored.withColumn("r",
        row_number().over(Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))))
      println(s"==== prepart=$prepart ====")
      ranked.write.format("noop").mode("overwrite").save()
      println(ranked.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Sort") ||
          l.contains("InMemory") || l.contains("Join") || l.contains("AQE"))
        .map(_.take(150)).mkString("\n"))
      layer0.unpersist(); vecs.unpersist()
    }
    spark.stop()
  }
}
