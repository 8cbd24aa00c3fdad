package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Ivf, Pq, Sq8}

/** Quantizer persistence: save → load must be bit-identical, so a
  * reloaded model reproduces the original's codes and search results
  * exactly (the artifact outlives the training session). */
class ModelStoreSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_ms_${tag}_").toString + "/model"

  test("IVF centroids round-trip bit-identically; reloaded model assigns identically") {
    val m = Ivf.train(emb, nCells = 8)
    val p = tmp("ivf")
    ModelStore.saveIvf(spark, m, p)
    val m2 = ModelStore.loadIvf(spark, p)
    assert(m2.metricName == m.metricName)
    assert(m2.centroids.length == m.centroids.length)
    assert(m.centroids.zip(m2.centroids).forall { case (a, b) => a.sameElements(b) })
    def cells(mm: Ivf.IvfModel) = emb
      .select(col("id"), Ivf.cellCol(mm)(col("vec")).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(cells(m) == cells(m2))
  }

  test("PQ codebook round-trips bit-identically; reloaded model encodes identically") {
    val m = Pq.train(emb)
    val p = tmp("pq")
    ModelStore.savePq(spark, m, p)
    val m2 = ModelStore.loadPq(spark, p)
    assert(m2.codebook.length == m.codebook.length)
    (m.codebook, m2.codebook).zipped.foreach { (s1, s2) =>
      assert(s1.length == s2.length)
      (s1, s2).zipped.foreach((c1, c2) => assert(c1.sameElements(c2)))
    }
    // PQ codes are packed 64-bit longs (8 subspaces x 8-bit centroid ids)
    val c1 = Pq.encode(emb, m).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val c2 = Pq.encode(emb, m2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c1 == c2)
  }

  test("SQ8 ranges round-trip bit-identically; reloaded model encodes identically") {
    val m = Sq8.train(emb)
    val p = tmp("sq8")
    ModelStore.saveSq8(spark, m, p)
    val m2 = ModelStore.loadSq8(spark, p)
    assert(m.mins.sameElements(m2.mins) && m.scales.sameElements(m2.scales))
    val c1 = Sq8.encode(emb, m).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    val c2 = Sq8.encode(emb, m2).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(c1 == c2)
  }

  test("loading the wrong kind fails loudly, not with a shape surprise") {
    val m = Sq8.train(emb)
    val p = tmp("wrongkind")
    ModelStore.saveSq8(spark, m, p)
    intercept[IllegalArgumentException] { ModelStore.loadPq(spark, p) }
  }
}
