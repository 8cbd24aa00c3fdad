package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MMR re-ranking invariants: pure-relevance degeneration, redundancy
  * suppression, and determinism. */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  test("lambda=1000 degenerates to the exact relevance ranking") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val vs = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val mmr = Mmr.rerank(qs, vs, kCandidates = 10, k = 5, lambdaPm = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val knn = ExactKnn.search(qs, vs, 5, "cosine")
      .select(col("qid"), col("rank").cast("long"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mmr == knn)
  }

  test("balanced lambda suppresses a near-duplicate of the top hit") {
    // The top hit must NOT be the query direction itself (else redundancy
    // vs it equals relevance and lambda=0.5 ties everything at zero).
    // id 1 = top hit, id 2 = its near-copy (score2 ~ 0.5*(0.743-0.9997)
    // < 0), id 3 = diverse with decent relevance (0.5*(0.707-0.053) > 0).
    // Pure relevance ranks [1, 2, 3]; MMR demotes the copy: [1, 3, 2].
    val qs = Seq((100L, Array(1f, 0f, 0f))).toDF("qid", "qvec")
    val vs = Seq(
      (1L, Array(1f, 0.9f, 0f)),
      (2L, Array(1f, 0.9f, 0.05f)),
      (3L, Array(1f, -1f, 0f))
    ).toDF("id", "vec")
    val got = Mmr.rerank(qs, vs, kCandidates = 3, k = 3, lambdaPm = 500)
      .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 3L, 2L))
  }

  test("emits at most the candidate count and is deterministic") {
    val qs = Seq((7L, Array(1f, 0f))).toDF("qid", "qvec")
    val vs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("id", "vec")
    val a = Mmr.rerank(qs, vs, kCandidates = 2, k = 2, lambdaPm = 300)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val b = Mmr.rerank(qs, vs, kCandidates = 2, k = 2, lambdaPm = 300)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.size == 2)
  }
}
