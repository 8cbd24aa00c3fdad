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

  test("nibble histogram: bins sum to the hex length, known payload exact") {
    val hists = Multimodal.nibbleHistogram(withBin)
    val bad = hists.filter(
      aggregate(col("hist"), lit(0L), (a, x) => a + x) =!= col("tot"))
    assert(bad.count() == 0)
    // "AB" = bytes 0x41 0x42 -> hex "4142": nibble '4' x2, '1' x1, '2' x1
    import spark.implicits._
    val one = Multimodal.nibbleHistogram(
      Multimodal.withBinaryPayload(Seq((0L, "AB")).toDF("doc_id", "text")))
      .head()
    assert(one.getAs[Long]("tot") == 4L)
    val h = one.getSeq[Long](one.fieldIndex("hist"))
    assert(h(4) == 2L && h(1) == 1L && h(2) == 1L && h.sum == 4L)
  }

  test("fingerprint pairs: exact L1, identical payloads at rel_bp 0") {
    import spark.implicits._
    val df = Multimodal.withBinaryPayload(Seq(
      (0L, "hello world hello"), // media image (0 % 3)
      (3L, "hello world hello"), // identical, same media
      (6L, "zzzzzzzzzzzzzzzzz")  // same media, different content
    ).toDF("doc_id", "text"))
    val pairs = Multimodal.fingerprintPairs(
        Multimodal.nibbleHistogram(df), num = 1, den = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.toSeq == Seq((0L, 3L, 0L, 0L)))
  }
}
