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

  test("matches a brute-force greedy reference on seeded random vectors") {
    // independent reference: same integer contract (micro-unit floor of
    // the kernel cosine, per-mille lambda, (score DESC, id ASC) ties)
    // computed by plain Scala over collected vectors
    val rng = new scala.util.Random(43)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
    val qs = Seq((1000L, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
    val (kCand, k, lamPm) = (12, 4, 700)

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    def simU(a: Array[Float], b: Array[Float]): Long =
      math.floor(cos(a, b) * 1000000.0).toLong

    val qvec = qs.head._2
    val cands = vecs.map { case (id, v) => (id, simU(qvec, v), v) }
      .sortBy { case (id, s, _) => (-s, id) }.take(kCand)
    val selected = collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    while (selected.length < k) {
      val remaining = cands.filterNot { case (id, _, _) => selected.exists(_._1 == id) }
      val pick = remaining.maxBy { case (id, s, v) =>
        val score =
          if (selected.isEmpty) s
          else lamPm * s - (1000L - lamPm) * selected.map(sv => simU(v, sv._2)).max
        (score, -id)
      }
      selected += ((pick._1, pick._3))
    }
    val expected = selected.map(_._1).toSeq

    val got = Mmr.rerank(qs.toDF("qid", "qvec"), vecs.toDF("id", "vec"),
        kCand, k, lamPm)
      .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(got == expected)
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
