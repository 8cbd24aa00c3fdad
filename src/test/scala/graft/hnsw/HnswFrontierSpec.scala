package graft.hnsw

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn

/** Frontier-join (pure DataFrame) layer-0 search must reach the recall of
  * the broadcast kernel on the same graph. */
class HnswFrontierSpec extends SparkSpec {

  test("frontier-join search: recall@10 >= kernel search on the same graph") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val cfg = BuildConfig(HnswParams.standard(64, 64, 16), "cosine", seed = 42L)
    val model = HnswDistributed.buildCached(vectors, cfg, sfDir + "|frontier")
    val links = GraphFrames.toLinksDF(spark, model.snapshot)

    val frontier = HnswFrontier.search(
        links, HnswFrontier.upperSnapshot(model.snapshot), vectors, queries,
        k = 10, ef = 64)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = ExactKnn.search(queries, vectors, 10, "cosine")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (frontier intersect exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"frontier recall=$recall")
  }
}
