package graft.streaming

import graft.SparkSpec
import graft.hnsw.{HnswDistributed, HnswParams, HnswRouted, HnswSearcher}
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ingest into the IVF-routed serving tier: micro-batches fold
  * through HnswRouted.ingest; the stream's result equals the same
  * batches applied sequentially (foreachBatch IS the sequential unit),
  * and the exhaustive-regime search over the grown index equals brute
  * force REGARDLESS of how the firehose was split — the split-invariant
  * gate (per-cell graphs differ with insertion order, but the
  * exhaustive oracle does not). */
class StreamingRoutedSpec extends SparkSpec {
  import spark.implicits._

  private def vecFromHash(i: Long, seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      (HnswSearcher.uniformFromHash(i * dim + d, seed) * 2.0 - 1.0).toFloat)

  private val cfg = BuildConfig(
    HnswParams.standard(64, 128, 16), metric = "cosine", seed = 42L)

  private def corpus(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map(i => (i.toLong, vecFromHash(i.toLong, 7L, 16)))

  test("foreachBatch routed ingest equals the same batches applied sequentially") {
    implicit val sqlCtx = spark.sqlContext
    val all = corpus(1600)
    val (seedRows, restRows) = all.splitAt(600)
    val batches = restRows.grouped(250).toSeq

    val streamed = new StreamingRouted.Handle(
      HnswRouted.build(seedRows.toDF("id", "vec"), cfg, nCells = 8))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingRouted.attach(mem.toDF().toDF("id", "vec"), streamed)
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    var sequential = HnswRouted.build(seedRows.toDF("id", "vec"), cfg,
      nCells = 8, persist = false)
    batches.foreach(b =>
      sequential = HnswRouted.ingest(sequential, b.toDF("id", "vec"),
        persist = false))

    assert(streamed.cellStats.sortBy(_._1).toSeq ==
      HnswRouted.cellStats(sequential).sortBy(_._1).toSeq)
    val qDf = all.take(50).toDF("qid", "qvec")
    def rows(ix: HnswRouted.RoutedIndex) =
      HnswRouted.search(ix, qDf, 10, nProbe = 8)
        .select(col("qid"), col("id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(rows(streamed.index) == rows(sequential))
    streamed.index.unpersist()
  }

  test("exhaustive search equals brute force at ANY firehose split") {
    val all = corpus(1200)
    val qDf = (0 until 40)
      .map(q => (q.toLong, vecFromHash(q.toLong + 80000, 9L, 16)))
      .toDF("qid", "qvec")
    val exact = ExactKnn.search(qDf, all.toDF("id", "vec"), 10, "cosine")
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (splits <- Seq(Seq(400, 800), Seq(100, 101, 700), Seq(1199))) {
      val bounds = (0 +: splits :+ all.length).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (a, b) => all.slice(a, b) }
      var ix = HnswRouted.build(batches.head.toDF("id", "vec"), cfg,
        nCells = 8, persist = false)
      batches.tail.foreach(b =>
        ix = HnswRouted.ingest(ix, b.toDF("id", "vec"), persist = false))
      val routed = HnswRouted.search(ix, qDf, 10, nProbe = 8)
        .select(col("qid"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(routed == exact, s"split $splits diverged from brute force")
    }
  }

  test("checkpoint cadence persists a complete version; attach + replay-from-checkpoint recovers") {
    implicit val sqlCtx = spark.sqlContext
    val all = corpus(1000)
    val (seedRows, restRows) = all.splitAt(400)
    val batches = restRows.grouped(200).toSeq // 3 batches
    val dir = java.nio.file.Files.createTempDirectory("graft-routed-ckpt").toString

    val h = new StreamingRouted.Handle(
      HnswRouted.build(seedRows.toDF("id", "vec"), cfg, nCells = 4))
    val mem = MemoryStream[(Long, Array[Float])]
    // save every 2 batches: after batch ids 0,1,2 the checkpoint holds
    // the fold through batch id 1 (seed + batches 0-1)
    val q = StreamingRouted.attach(mem.toDF().toDF("id", "vec"), h,
      checkpoint = Some((dir, 2)))
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val restored = HnswRouted.attach(spark, dir, persist = false)
    assert(HnswRouted.cellStats(restored).map(_._2).sum == 800L)
    // replay the unsaved tail (batch id 2) -> equals the live handle
    val caught = HnswRouted.ingest(restored, batches(2).toDF("id", "vec"),
      persist = false)
    assert(HnswRouted.cellStats(caught).sortBy(_._1).toSeq ==
      h.cellStats.sortBy(_._1).toSeq)
    val qDf = all.take(40).toDF("qid", "qvec")
    def rows(ix: HnswRouted.RoutedIndex) =
      HnswRouted.search(ix, qDf, 5, nProbe = 4)
        .select(col("qid"), col("id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(rows(caught) == rows(h.index))
    h.index.unpersist()
  }
}
