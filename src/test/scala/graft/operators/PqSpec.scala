package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PqKernels

/** Product quantization: deterministic training/encoding, the coarse
  * ADC + exact-rerank search recall floor, and codegen (no UDF) plans. */
class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val model = Pq.train(vectors, seed = 13L)

  test("null / NaN rows cannot poison training; dim mismatch fails loudly") {
    import spark.implicits._
    val poisoned = vectors.unionByName(
      Seq((9001L, null.asInstanceOf[Array[Float]]),
        (9002L, Array.fill(64)(Float.NaN))).toDF("id", "vec"))
    val m = Pq.train(poisoned, seed = 13L)
    assert(m.codebook.forall(_.forall(_.forall(v => !v.isNaN && !v.isInfinite))))
    // query/codebook dim mismatch must throw (misaligned subspaces would
    // rank candidates silently wrong — the sq8_adc guard, ported)
    val short = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array.fill(32)(0.0f))
    intercept[IllegalArgumentException](PqKernels.adc(short, 0L, m.codebook))
    intercept[IllegalArgumentException](PqKernels.encode(short, m.codebook))
  }

  test("training and encoding are deterministic; codes pack 16 nibbles") {
    val again = Pq.train(vectors, seed = 13L)
    assert(model.codebook.map(_.map(_.toList).toList).toList ==
      again.codebook.map(_.map(_.toList).toList).toList)
    val codes = Pq.encode(vectors, model).collect().map(_.getLong(1))
    assert(codes.distinct.length > 1, "codes must discriminate")
  }

  test("ADC distance of a vector to its own code equals its quantization error") {
    import graft.functions.PqFunctions
    val row = vectors
      .select(col("vec"),
        PqFunctions.pqAdc(col("vec"),
          PqFunctions.pqEncode(col("vec"), model.codebook), model.codebook).as("selfAdc"))
      .agg(max(col("selfAdc")).as("worst"), avg(col("selfAdc")).as("mean"))
      .head()
    // quantization error is bounded and small relative to typical
    // inter-vector distances (~2.0 squared L2 for these unit-ish vectors)
    assert(row.getDouble(1) < 2.0, s"mean self-ADC ${row.getDouble(1)}")
  }

  test("coarse ADC + exact re-rank: recall@10 >= 0.9 with 100 candidates") {
    val pq = Pq.search(queries, vectors, model, k = 10, candidates = 100)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "l2")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("encode and ADC are native expressions (no Scala UDF in the plan)") {
    // the re-rank materializes the candidate stage (localCheckpoint —
    // it feeds the broadcast-gate count AND the join), so the FINAL
    // plan no longer shows the candidate stage's expressions; pin the
    // no-UDF claim on the final plan and the native kernels on the
    // candidate stage's own plan (the encode + bounded-heap ADC scan)
    val plan = Pq.search(queries, vectors, model, k = 5, candidates = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"UDF in the PQ plan:\n$plan")
    val coarsePlan = graft.operators.ExactKnn.searchWith(
        queries, Pq.encode(vectors, model), 50,
        (q, c) => Pq.adcCol(model)(q, c), ascending = true, vecCol = "code")
      .queryExecution.executedPlan.toString
    assert(!coarsePlan.contains("UDF"), s"UDF in the ADC stage:\n$coarsePlan")
    assert(coarsePlan.contains("pq_encode") && coarsePlan.contains("pq_adc"),
      coarsePlan)
  }

  test("IVF-PQ compose: probing half the cells keeps recall@10 >= 0.8") {
    val ivfModel = Ivf.train(vectors, nCells = 16, metric = "l2", seed = 11L)
    val got = Pq.searchIvfPq(queries, vectors, ivfModel, model,
        k = 10, nProbe = 8, candidates = 100)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "l2")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("subspace geometry covers uneven dims") {
    assert(PqKernels.subDim(64) == 4)
    assert(PqKernels.subDim(62) == 4) // last subspace narrower: 62 - 15*4 = 2
  }
}
