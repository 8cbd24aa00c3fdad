package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Sq8Functions

/** Scalar (int8) quantization — the simplest member of the compressed-scan
  * ANN family (PQ's sibling): per-dimension affine byte codes, 4x smaller
  * than raw float32, no codebook lookup in the scan loop. At 100 TB the
  * raw embedding column becomes a 25 TB byte-code column; the serving
  * shape is coarse ADC top-C over the codes + exact re-rank of the C
  * survivors (same as [[Pq.search]]).
  *
  * Training is one distributed min/max aggregation (map-side partial agg,
  * one shuffle of O(dims x partitions) rows, dims floats to the driver) —
  * deterministic with no RNG and no iterations, which is the operational
  * advantage over PQ/IVF when the corpus refreshes continuously.
  */
object Sq8 {

  /** Per-dimension affine dequantization params: x ~ mins(i) + code * scales(i). */
  final case class Sq8Model(mins: Array[Float], scales: Array[Float]) extends Serializable

  /** Per-dimension corpus min/max -> byte range mapping. Non-finite
    * components are excluded from the range: Spark's max orders NaN
    * above every float, so one NaN would make that dimension's scale
    * NaN — and a NaN scale turns EVERY ADC distance NaN, silently
    * ranking all candidates by the aggregator's tie-break. */
  def train(vectors: DataFrame, vecCol: String = "vec"): Sq8Model = {
    val rows = vectors.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .filter(!isnan(col("x")) && abs(col("x")) < lit(Float.PositiveInfinity))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("dim"))
      .collect()
    require(rows.nonEmpty, "empty training set")
    val dims = rows.map(_.getInt(0)).max + 1
    val mins = new Array[Float](dims)
    val scales = new Array[Float](dims)
    rows.foreach { r =>
      val d = r.getInt(0)
      mins(d) = r.getFloat(1)
      scales(d) = (r.getFloat(2) - r.getFloat(1)) / 255f
    }
    Sq8Model(mins, scales)
  }

  /** Encoded table: (id, code binary) — persist once per corpus; this is
    * the 25%-of-raw column the compressed scan reads. */
  def encode(vectors: DataFrame, model: Sq8Model,
             idCol: String = "id", vecCol: String = "vec"): DataFrame =
    vectors.select(col(idCol).as("id"),
      Sq8Functions.sq8Encode(col(vecCol), model.mins, model.scales).as("code"))

  def adcCol(model: Sq8Model)(q: Column, code: Column): Column =
    Sq8Functions.sq8Adc(q, code, model.mins, model.scales)

  /** Coarse ADC top-`candidates` over the byte codes, then exact re-rank
    * of the survivors. Output (qid, id, score, rank), score = exact
    * squared L2, rank <= k. Serving workloads MUST pass
    * `precomputedCodes` (the persisted [[encode]] output); without it
    * every call re-encodes the raw vectors. */
  /** Coarse ADC top-`candidates` stage alone — the plan a spec pins for
    * the native `sq8_encode`/`sq8_adc` kernels ([[Pq.rerank]] checkpoints
    * the candidate set, so the final serving plan shows the
    * materialized `Scan ExistingRDD`, not the coarse kernels). */
  private[graft] def coarse(queries: DataFrame, codes: DataFrame,
                            model: Sq8Model, candidates: Int): DataFrame =
    ExactKnn.searchWith(queries, codes, candidates,
      (q, c) => adcCol(model)(q, c), ascending = true, vecCol = "code")
      .select(col("qid"), col("id"))

  def search(queries: DataFrame, vectors: DataFrame, model: Sq8Model,
             k: Int, candidates: Int,
             precomputedCodes: Option[DataFrame] = None): DataFrame = {
    val codes = precomputedCodes.getOrElse(encode(vectors, model))
    Pq.rerank(coarse(queries, codes, model, candidates), vectors, queries, k)
  }
}
