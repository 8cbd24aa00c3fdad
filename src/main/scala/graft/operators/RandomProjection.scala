package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Random projection (Johnson-Lindenstrauss) — the dimensionality-
  * reduction member of the compressed-scan ANN family, beside PQ
  * (codebooks), SQ8 (affine bytes), and BQ (sign bits): project
  * `inDim`-float vectors onto `outDim` deterministic ±1 directions
  * (Achlioptas 2003's database-friendly construction), scan in the
  * small space, re-rank the survivors exactly. At 100 TB a 64->16
  * projection makes the scan column 4x smaller AND each distance 4x
  * cheaper, with NO training pass at all — the matrix is pure
  * splitmix arithmetic from a seed, so (unlike PQ/SQ8/IVF) a
  * continuously-refreshing corpus never needs re-fitting and any
  * executor can re-derive the model from two ints.
  *
  * The projection stays inside whole-stage codegen with zero new
  * expression code: each output component is the existing
  * [[graft.functions.VectorExpressions.DotProductF32]] kernel against
  * a LITERAL ±1 row — `outDim` codegen'd dot products per row.
  * Unscaled ±1 sums are used (the 1/sqrt(outDim) JL factor is a
  * monotone constant — ranking by projected L2 is unchanged).
  */
object RandomProjection {

  /** outDim x inDim of ±1, derived entirely from (inDim, outDim, seed). */
  final case class RpModel(rows: Array[Array[Float]]) extends Serializable {
    def outDim: Int = rows.length
    def inDim: Int = if (rows.isEmpty) 0 else rows(0).length
  }

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic, data-free: sign(j,i) = sign bit of splitmix(seed
    * mixed with the flat index). No RNG state, no training scan. */
  def model(inDim: Int, outDim: Int, seed: Long): RpModel = {
    require(inDim >= 1 && outDim >= 1, "dims must be positive")
    val rows = Array.tabulate(outDim) { j =>
      Array.tabulate(inDim) { i =>
        if (splitmix(seed * 0x100000001B3L + j.toLong * inDim + i) < 0L) -1f else 1f
      }
    }
    RpModel(rows)
  }

  /** The projected vector as an array<float> column: outDim codegen'd
    * dot products against literal ±1 rows. */
  def projectCol(m: RpModel)(v: Column): Column =
    array(m.rows.map(r => VectorFunctions.dotF32(v, typedLit(r)).cast("float")): _*)

  /** Projected table (id, pvec) — persist once per corpus; this is the
    * outDim/inDim-of-raw column the coarse scan reads. */
  def encode(vectors: DataFrame, m: RpModel,
             idCol: String = "id", vecCol: String = "vec"): DataFrame =
    vectors.select(col(idCol).as("id"), projectCol(m)(col(vecCol)).as("pvec"))

  /** Coarse L2 top-`candidates` in the projected space, then exact L2
    * re-rank of the survivors in the original space. Output
    * (qid, id, score, rank), score = exact squared L2, rank <= k.
    * Serving workloads MUST pass `precomputedProjections` (the
    * persisted [[encode]] output). */
  /** Coarse projected-space top-`candidates` stage alone — the plan a
    * spec pins for the native `dot_f32`/`l2_sq_f32` kernels
    * ([[Pq.rerank]] checkpoints the candidate set, so the final serving
    * plan shows the materialized `Scan ExistingRDD`, not these). */
  private[graft] def coarse(queries: DataFrame, proj: DataFrame,
                            m: RpModel, candidates: Int): DataFrame = {
    val qProj = queries.select(col("qid"), projectCol(m)(col("qvec")).as("qpvec"))
    ExactKnn.searchWith(qProj, proj, candidates,
      (q, v) => VectorFunctions.l2Sq(q, v), ascending = true,
      queryVecCol = "qpvec", vecCol = "pvec")
      .select(col("qid"), col("id"))
  }

  def search(queries: DataFrame, vectors: DataFrame, m: RpModel,
             k: Int, candidates: Int,
             precomputedProjections: Option[DataFrame] = None): DataFrame = {
    val proj = precomputedProjections.getOrElse(encode(vectors, m))
    Pq.rerank(coarse(queries, proj, m, candidates), vectors, queries, k)
  }
}
