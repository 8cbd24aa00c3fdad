package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Sq8Functions

/** Scalar int8 quantization: affine round-trip error bounds, the coarse
  * ADC + exact-rerank recall floor, determinism, and codegen plans. */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val model = Sq8.train(vectors)

  test("a NaN/Inf component cannot poison the trained scales") {
    // Spark's max orders NaN above every float: without the non-finite
    // filter one NaN made that dim's scale NaN, which made EVERY ADC
    // distance NaN (candidates then ranked by tie-break only)
    val poisoned = vectors.unionByName(
      Seq((9001L, Array.fill(64)(Float.NaN)),
        (9002L, Array.fill(64)(Float.PositiveInfinity))).toDF("id", "vec"))
    val m = Sq8.train(poisoned)
    assert(m.mins.forall(v => !v.isNaN && !v.isInfinite), "mins poisoned")
    assert(m.scales.forall(v => !v.isNaN && !v.isInfinite), "scales poisoned")
    assert(m.mins.toSeq == model.mins.toSeq && m.scales.toSeq == model.scales.toSeq,
      "non-finite rows must not move the range at all")
  }

  test("training is deterministic and partitioning-invariant (pure min/max)") {
    val again = Sq8.train(vectors.repartition(13))
    assert(model.mins.toSeq == again.mins.toSeq)
    assert(model.scales.toSeq == again.scales.toSeq)
    assert(model.mins.length == 64)
  }

  test("self-ADC (quantization error) is bounded by the scale resolution") {
    val selfAdc = vectors
      .select(Sq8Functions.sq8Adc(col("vec"),
        Sq8Functions.sq8Encode(col("vec"), model.mins, model.scales),
        model.mins, model.scales).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    // worst case: every dim off by half a step -> sum_d (scale_d/2)^2
    val bound = model.scales.map(s => (s / 2.0) * (s / 2.0)).sum * 1.01
    assert(selfAdc <= bound, s"self-ADC $selfAdc above bound $bound")
  }

  test("degenerate constant dimension round-trips exactly") {
    val df = Seq((1L, Array(3.5f, 1.0f)), (2L, Array(3.5f, 2.0f))).toDF("id", "vec")
    val m = Sq8.train(df)
    assert(m.scales(0) == 0f)
    val err = df.select(Sq8Functions.sq8Adc(col("vec"),
        Sq8Functions.sq8Encode(col("vec"), m.mins, m.scales), m.mins, m.scales).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    // dim 0 is exact; dim 1 within (1/255)^2 of its unit range
    assert(err <= 2.0 / (255.0 * 255.0))
  }

  test("coarse ADC + exact re-rank: recall@10 >= 0.95 with 100 candidates") {
    val got = Sq8.search(queries, vectors, model, k = 10, candidates = 100)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "l2")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall")
  }

  test("encode and ADC are native expressions (no Scala UDF in the plan)") {
    // the kernel names live in the COARSE plan — Pq.rerank checkpoints
    // the candidate set, so the final plan shows Scan ExistingRDD there
    val coarsePlan = Sq8.coarse(queries, Sq8.encode(vectors, model), model,
        candidates = 50).queryExecution.executedPlan.toString
    assert(!coarsePlan.contains("UDF"), s"UDF in the SQ8 coarse plan:\n$coarsePlan")
    assert(coarsePlan.contains("sq8_encode") && coarsePlan.contains("sq8_adc"), coarsePlan)
    val finalPlan = Sq8.search(queries, vectors, model, k = 5, candidates = 50)
      .queryExecution.executedPlan.toString
    assert(!finalPlan.contains("UDF"), s"UDF in the SQ8 serving plan:\n$finalPlan")
    // serving regime: small candidate set must BROADCAST into the
    // re-rank join (the vectors side streams — never shuffles)
    assert(finalPlan.contains("BroadcastExchange"),
      s"re-rank candidates not broadcast:\n$finalPlan")
  }
}
