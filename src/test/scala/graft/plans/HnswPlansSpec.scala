package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.hnsw.{HnswDistributed, HnswParams}
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn

/** Planner integration: the HnswKnn node plans into HnswKnnExec and
  * returns exact results; the ORDER BY/LIMIT rewrite injects the index
  * candidate filter and preserves semantics. */
class HnswPlansSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private val cfg = BuildConfig(HnswParams.standard(64, 128, 16), "cosine", seed = 42L)
  private lazy val model = HnswDistributed.buildCached(vectors, cfg, sfDir + "|plans")

  private def installed(): Unit = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_.isInstanceOf[HnswStrategy]) :+ new HnswStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[HnswTopKRewrite]) :+ HnswTopKRewrite(spark)
  }

  test("HnswKnn node plans through the strategy and matches exact kNN") {
    installed()
    val df = HnswSql.knn(queries, model, 10)
    // SparkPlan display strips the Exec suffix; match the physical node by
    // its class to be unambiguous.
    val physical = df.queryExecution.executedPlan.collectFirst {
      case e: HnswKnnExec => e
    }
    assert(physical.isDefined, df.queryExecution.executedPlan.getClass.toString)
    val got = df.select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "cosine")
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exact)
  }

  test("the physical operator honors k beyond the model's efSearch") {
    installed()
    // model efSearch(0) = 128; ask for more than the configured beam —
    // plain search silently truncated the result to 128 rows per query
    val k = 150
    val got = HnswSql.knn(queries.limit(3), model, k)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(got.nonEmpty && got.forall(_ == k.toLong),
      s"expected $k rows per query, got ${got.toSeq}")
  }

  test("ORDER BY cosine DESC LIMIT k rewrites to an index candidate filter") {
    installed()
    HnswCatalog.register(s"$sfDir/embeddings.parquet", model,
      idCol = "vec_id", vecCol = "embedding")
    try {
      val qvec = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val q = emb
        .orderBy(VectorFunctions.cosineSim(col("embedding"), typedlit(qvec)).desc)
        .limit(10)
        .select("vec_id")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vec_id#") && optimized.contains(" IN "),
        s"no index filter injected:\n$optimized")

      val got = q.collect().map(_.getLong(0)).toList
      // ground truth without the rule: fresh plan on a session w/o rewrite
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[HnswTopKRewrite])
      val truth = emb
        .orderBy(VectorFunctions.cosineSim(col("embedding"), typedlit(qvec)).desc)
        .limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toList
      assert(got == truth)
    } finally HnswCatalog.unregister(s"$sfDir/embeddings.parquet")
  }

  test("filtered top-k: skipped by default (exact), rewritten under the over-fetch opt-in") {
    installed()
    HnswCatalog.register(s"$sfDir/embeddings.parquet", model,
      idCol = "vec_id", vecCol = "embedding")
    try {
      val qvec = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      def filteredTopK = emb
        .filter(col("vec_id") % 2 === 0) // WHERE between sort and relation
        .orderBy(VectorFunctions.cosineSim(col("embedding"), typedlit(qvec)).desc)
        .limit(5)
        .select("vec_id")

      // Default: the rewrite must NOT touch filtered plans — no finite
      // over-fetch guarantees k survivors, so exactness wins.
      val defaultPlan = filteredTopK.queryExecution.optimizedPlan.toString
      assert(!defaultPlan.contains(" IN "), s"filtered plan was rewritten:\n$defaultPlan")
      val truth = filteredTopK.collect().map(_.getLong(0)).toList

      // Opt-in: F*k candidates fetched before the predicate; with half the
      // rows surviving, 8x over-fetch comfortably covers the true top-5.
      spark.conf.set(HnswTopKRewrite.FilterOverfetchConf, "8")
      try {
        val optPlan = filteredTopK.queryExecution.optimizedPlan.toString
        assert(optPlan.contains(" IN "), s"opt-in did not rewrite:\n$optPlan")
        assert(filteredTopK.collect().map(_.getLong(0)).toList == truth)
      } finally spark.conf.unset(HnswTopKRewrite.FilterOverfetchConf)
    } finally HnswCatalog.unregister(s"$sfDir/embeddings.parquet")
  }
}
