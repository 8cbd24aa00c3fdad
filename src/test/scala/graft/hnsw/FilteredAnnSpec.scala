package graft.hnsw

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn

class FilteredAnnSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val qs = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val cfg = BuildConfig(
    HnswParams.standard(efConstruction = 64, efSearch = 128, m = 16),
    metric = "cosine", seed = 42L)
  private lazy val model = HnswDistributed.build(vecs, cfg)

  private def exactFiltered(allowed: org.apache.spark.sql.DataFrame, k: Int) =
    ExactKnn.search(qs,
        vecs.join(allowed.withColumnRenamed(allowed.columns.head, "id"), Seq("id")),
        k, "cosine")
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("filtered search equals brute-force filtered kNN (moderate selectivity)") {
    val allowed = emb.filter(col("label") === 3).select(col("vec_id"))
    val got = HnswDistributed.searchFiltered(qs, model, allowed, 10)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exactFiltered(allowed, 10))
    assert(got.nonEmpty)
  }

  test("rare predicate escalates to exhaustive and returns all allowed hits") {
    // 3 allowed ids, k=5: k' must escalate to the whole index and each
    // query must return exactly the 3 allowed vectors, exactly ranked
    val allowed = emb.filter(col("vec_id").isin(7L, 133L, 411L)).select(col("vec_id"))
    val got = HnswDistributed.searchFiltered(qs, model, allowed, 5)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exactFiltered(allowed, 5))
    val perQ = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQ.values.forall(_ == 3))
  }

  test("empty allowed set returns no rows") {
    val allowed = emb.filter(col("vec_id") < 0).select(col("vec_id"))
    assert(HnswDistributed.searchFiltered(qs, model, allowed, 10).count() == 0)
  }

  test("all-allowed filter degenerates to the plain search") {
    val allowed = emb.select(col("vec_id"))
    val got = HnswDistributed.searchFiltered(qs, model, allowed, 10)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = HnswDistributed.search(qs, model, 10)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == plain)
  }

  test("empty deletion set degenerates searchExcluding to the plain search") {
    val deleted = emb.filter(col("vec_id") < 0).select(col("vec_id"))
    val got = HnswDistributed.searchExcluding(qs, model, deleted, 10)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = HnswDistributed.search(qs, model, 10)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == plain)
  }

  test("searchExcluding matches brute force minus the deleted set") {
    val deleted = emb.filter(col("vec_id") % 3 === 1).select(col("vec_id"))
    val deletedSet = deleted.collect().map(_.getLong(0)).toSet
    val got = HnswDistributed.searchExcluding(qs, model, deleted, 5)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.forall { case (_, id, _) => !deletedSet.contains(id) })
    val exact = graft.operators.ExactKnn.search(
        qs, vecs.join(deleted,
          vecs("id") === deleted("vec_id"), "left_anti"), 5, "cosine")
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.toSet == exact)
  }

  test("deleting everything yields zero rows, not a hang or crash") {
    val deleted = emb.select(col("vec_id"))
    assert(HnswDistributed.searchExcluding(qs, model, deleted, 10).count() == 0)
  }
}
