package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: binary payload schema, stub decode contract,
  * bounded frame sampling. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val withBin = Multimodal.withBinaryPayload(docs)

  test("stub decode: typed mapPartitions yields deterministic fixed-dim features") {
    val f1 = Multimodal.stubDecodeFeatures(withBin)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toMap
    val f2 = Multimodal.stubDecodeFeatures(withBin)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.size == 8))
    assert(f1.nonEmpty && f1.values.exists(_.exists(_ != 0f)))
  }

  test("decoded features flow into the vector operators (similarity plumbing e2e)") {
    val feats = Multimodal.stubDecodeFeatures(withBin)
    val qs = feats.filter(col("id") % 100 === 0)
      .select(col("id").as("qid"), col("features").as("qvec"))
    val vs = feats.select(col("id"), col("features").as("vec"))
    val knn = ExactKnn.search(qs, vs, 5, "cosine")
    val perQ = knn.groupBy("qid").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 5))
  }

  test("frame sampling: bounded rows, positional bytes, no payload-width rows") {
    val frames = Multimodal.sampleFrames(withBin)
    val stats = frames.agg(max(col("frame_idx")), max(col("frame_bytes"))).head()
    assert(stats.getInt(0) <= 7)    // maxFrames = 8
    assert(stats.getInt(1) <= 256)  // frameBytes cap
    // every doc appears, with n_frames = min(8, max(1, floor(bytes/256)))
    val n = frames.select("doc_id").distinct().count()
    assert(n == docs.count())
  }
}
