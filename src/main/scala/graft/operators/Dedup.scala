package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.hnsw.HnswDistributed
import graft.hnsw.HnswDistributed.BuildConfig

import scala.util.Random

/** Deduplication operators — the LinearDb insert-if-no-match contract
  * (reference: src/linear_db.rs:17-35) plus the scale paths a 100 TB
  * training-data pipeline needs: LSH-bucketed and ANN-index-backed
  * near-duplicate detection, with brute force kept as the small-scale
  * correctness oracle.
  */
object Dedup {

  /** L1 — insert-if-not-exists with an exact key (reference
    * linear_db.rs:17-25): drop incoming rows whose `key` column already
    * exists in the store, and dedup the incoming batch itself (the
    * sequential reference loop dedups within the stream too — batch
    * semantics keep the lowest id per duplicate group). Idempotent:
    * inserting the same batch twice equals inserting it once
    * (linear_db.rs:43-52). One shuffle on the key; anti-join broadcasts
    * when the store fits.
    */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame,
                     key: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fresh = incoming
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(idCol))))
      .filter(col("__rk") === 1).drop("__rk")
      .join(existing.select(col(key)), Seq(key), "left_anti")
    existing.unionByName(fresh)
  }

  /** Seeded Rademacher (+-1) projection matrix for SimHash signatures:
    * `nBits` hyperplanes over `dim` input dims. Deterministic in (seed,
    * nBits, dim) — executors regenerate it locally. Kept as the specs'
    * independent reference for [[graft.functions.SimHashSigF32]]'s flat
    * matrix (same draw order). */
  private[operators] def projections(nBits: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rng = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)(if (rng.nextBoolean()) 1f else -1f))
  }

  /** SimHash signature column: pack the signs of `nBits` random
    * projections of the embedding into nBits/64 longs. One scan, no
    * shuffle; the signature is the bucketing key for banded LSH.
    * Codegen'd native expression — the 512-projection pass is the
    * dominant per-row cost of the LSH queries and must not run through
    * a boxed UDF. */
  def simhashSig(nBits: Int, dim: Int, seed: Long): Column => Column =
    c => graft.functions.VectorFunctions.simhashSig(c, nBits, dim, seed)

  /** Banded-LSH candidate pairs over an embedding column: signature ->
    * `bands` buckets of `rowsPerBand` bits -> self-join within buckets.
    * Output (a_id, b_id) distinct with a_id < b_id. Shuffle volume is
    * O(n x bands) rows; bucket joins replace the all-pairs theta join
    * (O(n^2)) that cannot complete at scale. Recall at similarity s is
    * 1 - (1 - p^r)^b with p = 1 - arccos(s)/pi — choose (bands, rows) for
    * the target threshold; the defaults suit s >= 0.5.
    */
  def lshCandidatePairs(vectors: DataFrame, idCol: String, vecCol: String,
                        nBits: Int = 512, bands: Int = 64, rowsPerBand: Int = 8,
                        dim: Int = 64, seed: Long = 7L): DataFrame = {
    val (stream, banded) =
      lshCandidateStream(vectors, idCol, vecCol, nBits, bands, rowsPerBand, dim, seed)
    // eager: pay the distinct now so the banded cache can release
    try stream.distinct().localCheckpoint()
    finally banded.unpersist(blocking = false)
  }

  /** Banded-LSH candidate pairs WITH band multiplicity (a pair appears
    * once per colliding band) — the pre-`distinct` stream, plus the
    * cached banded frame backing it. Callers MUST unpersist the returned
    * `banded` handle once the stream is consumed (the eager consumers
    * above do, in a finally) — it holds O(n x bands) cached rows. */
  private def lshCandidateStream(vectors: DataFrame, idCol: String, vecCol: String,
                                 nBits: Int, bands: Int, rowsPerBand: Int,
                                 dim: Int, seed: Long): (DataFrame, DataFrame) = {
    require(bands * rowsPerBand <= nBits, "bands*rowsPerBand must fit in nBits")
    // repartition: small parquet inputs arrive as one split; the
    // projection-heavy signature pass should use every core. cache: the
    // banded rows feed both sides of the bucket self-join. Signature +
    // band slicing are ONE fused codegen'd kernel (SimHashBandsF32) —
    // posexplode over its output array IS (band_idx, band_val).
    val banded = vectors
      .repartition(vectors.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("__id"),
        posexplode(graft.functions.VectorFunctions.simhashBands(
          col(vecCol), nBits, dim, seed, bands, rowsPerBand))
          .as(Seq("band_idx", "band_val")))
      .cache()
    val stream = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"))
    (stream, banded)
  }

  /** Near-duplicate pairs via banded SimHash-LSH + exact cosine verify:
    * precision 1.0 by construction (every emitted pair is re-checked with
    * the exact kernel); recall governed by the banding parameters.
    *
    * Verify-FIRST, dedup after: at moderate thresholds the background
    * per-band collision rate (0.5 per bit) makes the candidate stream
    * nearly all-pairs x bands, so a `distinct` before the verify is the
    * dominant shuffle. The vector sides broadcast (or shuffle
    * proportionally at scale), the codegen'd cosine kernel filters the
    * stream down to the few true pairs in-map, and only those survivors
    * pay the distinct. Band multiplicity re-verifies a true pair once per
    * colliding band — pure map-side CPU, far cheaper than shuffling the
    * full candidate stream. */
  def neardupLsh(vectors: DataFrame, idCol: String, vecCol: String,
                 threshold: Double, nBits: Int = 512, bands: Int = 64,
                 rowsPerBand: Int = 8, seed: Long = 7L, dim: Int = 64): DataFrame = {
    // `dim` must cover the embedding width: simhashSig projects only the
    // first `dim` components, so a too-small value silently drops the
    // tail dimensions from every signature and the documented banding
    // recall bound no longer holds
    val (cand, banded) =
      lshCandidateStream(vectors, idCol, vecCol, nBits, bands, rowsPerBand, dim, seed)
    try {
      val a = vectors.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
      val b = vectors.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
      // localCheckpoint (eager): the verified pair set is tiny; pinning
      // IT lets the O(n x bands) banded cache release before returning
      // instead of leaking until session end
      cand.join(a, "a_id").join(b, "b_id")
        .filter(cosineSim(col("a_vec"), col("b_vec")) >= threshold)
        .select(col("a_id"), col("b_id"))
        .distinct()
        .localCheckpoint()
    } finally banded.unpersist(blocking = false)
  }

  /** Near-duplicate pairs via the HNSW index — the reference-native scale
    * path (the index exists to make the similarity join sub-linear,
    * README.md:16): search every vector's top-k, keep pairs passing the
    * exact cosine verify. O(n log n) index probes instead of O(n^2)
    * kernel evaluations; k bounds the per-vector duplicate fan-out. */
  def neardupAnn(vectors: DataFrame, idCol: String, vecCol: String,
                 threshold: Double, k: Int = 40,
                 cfg: BuildConfig = BuildConfig(),
                 cacheKey: Option[String] = None): DataFrame = {
    val vecs = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val model = cacheKey match {
      case Some(key) => HnswDistributed.buildCached(vecs, cfg, key)
      case None      => HnswDistributed.build(vecs, cfg)
    }
    val qs = vectors.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    // Normalize pair direction instead of filtering qid < id: HNSW
    // neighborhoods are asymmetric, so the higher-id query may be the
    // only one to discover a pair — least/greatest keeps discoveries
    // from either side.
    val hits = HnswDistributed.search(qs, model, k)
      .select(least(col("qid"), col("id")).as("a_id"),
        greatest(col("qid"), col("id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
    val a = vecs.select(col("id").as("a_id"), col("vec").as("a_vec"))
    val b = vecs.select(col("id").as("b_id"), col("vec").as("b_vec"))
    hits.join(a, "a_id").join(b, "b_id")
      .filter(cosineSim(col("a_vec"), col("b_vec")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }
}
