package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF invariants: exhaustive probing equals exact search; the ANN regime
  * keeps a recall floor with a fraction of the candidates; training is
  * deterministic. */
class IvfSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val model = Ivf.train(vectors, nCells = 16, seed = 11L)

  test("null / non-finite vectors cannot poison training") {
    import spark.implicits._
    // a null vec NPE'd the driver loop; a NaN component made one cell's
    // running sum NaN — that centroid then repelled every assignment
    // forever (silently dead cell, degraded recall)
    val poisoned = vectors.unionByName(
      Seq((9001L, null.asInstanceOf[Array[Float]]),
        (9002L, Array.fill(64)(Float.NaN))).toDF("id", "vec"))
    val m = Ivf.train(poisoned, nCells = 16, seed = 11L)
    assert(m.centroids.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
    assert(m.centroids.zip(model.centroids).forall { case (a, b) => a.toSeq == b.toSeq },
      "poisoned rows must not move any centroid")
  }

  test("exhaustive probing (nProbe = nCells) equals exact kNN") {
    val ivf = Ivf.search(queries, vectors, model, k = 10, nProbe = 16)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "cosine")
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == exact)
  }

  test("ANN regime: probing half the cells keeps recall@10 >= 0.75") {
    // NB the testdata embeddings are near-random (no cluster structure),
    // the hardest case for a coarse quantizer — recall on clustered real
    // data is substantially higher at the same probe budget.
    val ivf = Ivf.search(queries, vectors, model, k = 10, nProbe = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ExactKnn.search(queries, vectors, 10, "cosine")
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.75, s"recall=$recall")
  }

  test("cell assignment and probe list are native expressions (no Scala UDF in the plan)") {
    val plan = Ivf.search(queries, vectors, model, k = 5, nProbe = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"UDF left in the IVF plan:\n$plan")
    assert(plan.contains("ivf_cell") && plan.contains("ivf_probes"), plan)
  }

  test("training is deterministic; cells partition the table") {
    val again = Ivf.train(vectors, nCells = 16, seed = 11L)
    assert(model.centroids.map(_.toList).toList == again.centroids.map(_.toList).toList)
    // ...and PARTITIONING-invariant: the sample is hash-selected + id-
    // sorted, so the physical layout cannot pick different training
    // rows (a bare limit() did — measured as run-to-run recall drift)
    val shuffled = Ivf.train(vectors.repartition(23), nCells = 16, seed = 11L)
    assert(model.centroids.map(_.toList).toList == shuffled.centroids.map(_.toList).toList)
    val cell = Ivf.cellCol(model)
    val counts = vectors.withColumn("cell", cell(col("vec")))
      .groupBy("cell").count().collect()
    assert(counts.map(_.getLong(1)).sum == vectors.count())
  }
}
