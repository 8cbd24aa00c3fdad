package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, then look for
  * near-duplicate pairs only WITHIN each cluster — the pair space drops
  * from O(n^2) to sum over clusters of |c|^2 (~ n^2/k for balanced
  * clusters), which is what makes embedding-level dedup feasible on a
  * 100 TB corpus. The price is recall: a pair split across two clusters
  * is never examined. [[report]] measures exactly that loss against the
  * brute-force pair set.
  *
  * Scale shape: assignment is the zero-shuffle codegen'd argmin scan
  * (KMeans.assign); the candidate stage is ONE equi-join on `cid` — a
  * plain shuffle join whose per-key work is bounded by the cluster size,
  * so k is the knob that trades recall for cost (pick k ~ n / desired
  * cluster size; a skewed giant cluster degrades toward brute force but
  * never past it). Every emitted pair is exact-cosine verified in the
  * same codegen'd filter, so precision is 1.0 by construction.
  *
  * No reference analog (hawk-pack dedups via its HNSW `is_match`); this
  * is part of the LLM-pipeline surface. The ANN-indexed alternative is
  * `Dedup.neardupAnn`; SemDedup is the cheaper flat-index variant that
  * needs no graph build and re-uses the corpus' k-means structure.
  */
object SemDedup {

  /** Near-duplicate pairs found within clusters of the given centroid
    * set: `(a_id, b_id)` with `a_id < b_id` and exact cosine >= threshold,
    * both endpoints assigned to the same centroid. Deterministic given
    * the centroids (assignment ties keep the smallest cid — KMeans.assign).
    */
  def pairs(vecs: DataFrame, centroids: Array[Array[Float]], threshold: Double,
            idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val assigned = KMeans.assign(vecs, centroids, idCol, vecCol)
      .select(col(idCol), col("cid"))
      .join(vecs.select(col(idCol), col(vecCol)), idCol)
    val a = assigned.select(col("cid"), col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val b = assigned.select(col("cid").as("b_cid"), col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    a.join(b, col("cid") === col("b_cid") && col("a_id") < col("b_id"))
      .filter(cosineSim(col("a_vec"), col("b_vec")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** Keep-lowest-id survivors: resolve the pair graph to connected
    * components (transitive duplicate groups), keep each group's minimum
    * id plus every vector in no pair. Returns `(id)` survivors. */
  def survivors(vecs: DataFrame, dupPairs: DataFrame,
                idCol: String = "id"): DataFrame = {
    val comps = ConnectedComponents.run(
      dupPairs.select(col("a_id").as("src"), col("b_id").as("dst")))
    val dropped = comps.filter(col("id") =!= col("comp")).select(col("id"))
    vecs.select(col(idCol).cast("long").as("id"))
      .join(dropped, Seq("id"), "left_anti")
  }

  /** The exact all-pairs truth count for [[report]]'s recall audit — the
    * audit's oracle, O(n^2) by definition. Callers measuring serving time
    * should compute this ONCE per corpus (memoized + BuildLedger) and
    * pass it to [[reportWithTruth]]. */
  def bruteForcePairCount(vecs: DataFrame, threshold: Double,
                          idCol: String = "id", vecCol: String = "vec"): Long = {
    // streamed side repartitioned: this non-equi self-join plans as
    // BroadcastNestedLoop, whose parallelism is a's partition count — a
    // small scan's single partition would run the O(n²) audit one-core
    val a = vecs.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
      .repartition(vecs.sparkSession.sparkContext.defaultParallelism)
    val b = vecs.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(cosineSim(col("a_vec"), col("b_vec")) >= threshold)
      .count()
  }

  /** One-row audit of the cluster-bounded pass against brute force:
    * how many pairs the cluster restriction found vs the exact all-pairs
    * set, recall in basis points, and the survivor count after pruning.
    * The brute pair scan is the measurement cost — run at audit scale
    * factors, not the full corpus. */
  def report(vecs: DataFrame, centroids: Array[Array[Float]], threshold: Double,
             idCol: String = "id", vecCol: String = "vec"): DataFrame =
    reportWithTruth(vecs, centroids, threshold,
      bruteForcePairCount(vecs, threshold, idCol, vecCol), idCol, vecCol)

  /** [[report]] against a precomputed truth count: every found pair is
    * exact-cosine verified within a cluster, hence a subset of the brute
    * set — recall is a pure count ratio, no join needed. */
  def reportWithTruth(vecs: DataFrame, centroids: Array[Array[Float]],
                      threshold: Double, nBrute: Long,
                      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val found = pairs(vecs, centroids, threshold, idCol, vecCol).cache()
    val nFound = found.count()
    // n_vectors and n_survivors from ONE aggregate (round-20): dropped
    // ids are unique (one row per component member), so a left join +
    // null-flag count equals the old left_anti count, and counting every
    // row in the same pass replaces the separate vecs.count() job.
    val comps = ConnectedComponents.run(
      found.select(col("a_id").as("src"), col("b_id").as("dst")))
    val dropped = comps.filter(col("id") =!= col("comp"))
      .select(col("id"), lit(1L).as("__d"))
    val vRow = vecs.select(col(idCol).cast("long").as("id"))
      .join(dropped, Seq("id"), "left")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("__d").isNull, 1L).otherwise(0L)), lit(0L))
          .as("kept"))
      .head()
    val (nVecs, nKept) = (vRow.getLong(0), vRow.getLong(1))
    found.unpersist(blocking = false)
    val recallBp = if (nBrute == 0) 10000L else nFound * 10000L / nBrute
    Seq((nVecs, centroids.length.toLong, nFound, nBrute, recallBp, nKept))
      .toDF("n_vectors", "n_clusters", "n_pairs_found", "n_pairs_exact",
        "recall_bp", "n_survivors")
  }
}
