package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded-heap aggregation path must agree exactly with the
  * window-rank path (which mirrors the SQL oracle) on every metric. */
class ExactKnnSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  for (metric <- Seq("cosine", "l2", "dot")) {
    test(s"aggregator path == windowed path ($metric)") {
      val a = ExactKnn.search(queries, vectors, 10, metric)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val w = ExactKnn.searchWindowed(queries, vectors, 10, metric)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(a == w)
    }
  }

  test("top-k matches a driver-side reference computation (cosine)") {
    import graft.store.Metrics
    val vecs = vectors.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qs = queries.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expected = qs.flatMap { case (qid, qv) =>
      vecs.map { case (id, v) => (qid, id, 1.0 - Metrics.cosineDist(qv, v)) }
        .sortBy { case (_, id, s) => (-s, id) }
        .take(10).zipWithIndex
        .map { case ((_, id, _), i) => (qid, id, i + 1) }
    }.toSet
    val got = ExactKnn.search(queries, vectors, 10, "cosine")
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }
}
