package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998): greedily select k results from a candidate list, each step
  * maximizing `lambda * sim(q, d) - (1 - lambda) * max_{s in S} sim(d, s)`
  * — relevance minus redundancy against what's already selected. The
  * serving-layer diversity pass a retrieval pipeline runs after ANN.
  *
  * Determinism across engines: every similarity is floored to integer
  * micro-units by the SAME codegen'd cosine kernel the rest of the
  * catalog hash-matches through, lambda is a per-mille integer, and the
  * greedy argmax runs entirely on longs with (score DESC, id ASC)
  * tie-breaks — so a step-unrolled SQL oracle reproduces the selection
  * exactly.
  *
  * Scale shape: candidate generation is the bounded-heap [[ExactKnn]]
  * (swap in any ANN index upstream); the pair-similarity stage is one
  * self-join bounded by kCandidates^2 rows PER QUERY (not corpus-sized);
  * the greedy is executor-local per query via `flatMapGroups` —
  * embarrassingly parallel across queries, O(k * kCandidates) integer
  * ops per query, no driver participation.
  */
object Mmr {

  /** Re-rank each query's top-`kCandidates` exact-cosine candidates down
    * to `k` diverse results. `lambdaPm` is lambda in per-mille (500 =
    * the balanced MMR). Output: (qid, rank, id), ranks 1..k. */
  def rerank(queries: DataFrame, vectors: DataFrame,
             kCandidates: Int, k: Int, lambdaPm: Int = 500): DataFrame = {
    require(k >= 1 && kCandidates >= k, s"need kCandidates >= k >= 1")
    require(lambdaPm >= 0 && lambdaPm <= 1000, "lambdaPm in [0, 1000]")
    val spark = queries.sparkSession
    import spark.implicits._

    val cands = ExactKnn.search(queries, vectors, kCandidates, "cosine")
      .select(col("qid"), col("id"),
        floor(col("score") * lit(1000000.0)).cast("long").as("sim_u"))
    val withVec = cands.join(vectors, "id")
    val a = withVec.select(col("qid"), col("id").as("a_id"),
      col("sim_u"), col("vec").as("a_vec"))
    val b = withVec.select(col("qid").as("b_qid"), col("id").as("b_id"),
      col("vec").as("b_vec"))
    val pairs = a.join(b, col("qid") === col("b_qid"))
      .select(col("qid"), col("a_id"), col("sim_u"), col("b_id"),
        floor(cosineSim(col("a_vec"), col("b_vec")) * lit(1000000.0))
          .cast("long").as("p_u"))

    pairs.as[(Long, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val rows = it.toArray // <= kCandidates^2 tuples
        val simU = collection.mutable.LongMap.empty[Long]
        val pU = collection.mutable.HashMap.empty[(Long, Long), Long]
        rows.foreach { case (_, aId, s, bId, p) =>
          simU(aId) = s
          pU((aId, bId)) = p
        }
        val remaining = collection.mutable.SortedSet.empty[Long] ++ simU.keys
        val selected = collection.mutable.ArrayBuffer.empty[Long]
        while (selected.length < k && remaining.nonEmpty) {
          var bestId = -1L
          var bestScore = Long.MinValue
          // ascending id iteration + strict > keeps the SMALLEST id
          // among equal scores — the oracle's (score DESC, id) order
          remaining.foreach { d =>
            val redundancy =
              if (selected.isEmpty) 0L
              else selected.iterator.map(s => pU((d, s))).max
            val score =
              if (selected.isEmpty) simU(d) // first pick: pure relevance
              else lambdaPm * simU(d) - (1000L - lambdaPm) * redundancy
            if (score > bestScore) { bestScore = score; bestId = d }
          }
          selected += bestId
          remaining -= bestId
        }
        selected.iterator.zipWithIndex.map { case (id, i) =>
          (qid, (i + 1).toLong, id)
        }
      }
      .toDF("qid", "rank", "id")
  }
}
