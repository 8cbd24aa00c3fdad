package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream == batch for the release pipeline: the documents corpus
  * landed as JSONL shards in doc_id order must release row-identically
  * to the batch capstone row, across batch boundaries, with duplicate
  * texts surviving only at first arrival and redelivery staying
  * idempotent.
  */
class StreamingReleaseSpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files
    .createTempDirectory(p).toString

  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"), col("source"))

  test("streamed release equals the batch capstone row for row") {
    import graft.sources.Ingest
    val land = tmp("graft_rel_land_")
    val state = tmp("graft_rel_state_")
    val out = tmp("graft_rel_out_")
    // two waves in doc_id order (first-arrival == min-doc_id then);
    // shards must land FLAT in the directory (the text stream source
    // does not recurse), so each wave's part files are moved up
    def landWave(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val stage = tmp(s"graft_rel_w_$tag")
      Ingest.writeJsonl(df, stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Path.of(land, s"${tag}_$i.jsonl"))
        }
    }
    val n = docs.count()
    landWave(docs.filter(col("doc_id") < n / 2), "w0")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING")
    val q = StreamingRelease.attach(
      Ingest.streamJsonl(spark, land, schema), state, out)
    try {
      q.processAllAvailable()
      landWave(docs.filter(col("doc_id") >= n / 2), "w1")
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamingRelease.released(spark, out)
      .collect().map(_.toSeq).toSeq
    val expected = graft.SparkEntry.queries("p_release_pipeline")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(got.size == expected.size,
      s"stream released ${got.size}, batch ${expected.size}")
    assert(got == expected)
  }

  test("restart with a checkpointLocation resumes from source progress (no replay)") {
    import graft.sources.Ingest
    val land = tmp("graft_rel3_land_")
    val state = tmp("graft_rel3_state_")
    val out = tmp("graft_rel3_out_")
    val ckpt = tmp("graft_rel3_ckpt_")
    def landWave(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val stage = tmp(s"graft_rel3_w_$tag")
      Ingest.writeJsonl(df, stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Path.of(land, s"${tag}_$i.jsonl"))
        }
    }
    val n = docs.count()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING")
    landWave(docs.filter(col("doc_id") < n / 2), "w0")
    val q1 = StreamingRelease.attach(
      Ingest.streamJsonl(spark, land, schema), state, out, Some(ckpt))
    try q1.processAllAvailable() finally q1.stop()
    // restart against the SAME checkpoint: already-landed files must not
    // be re-read (without the checkpoint a restart re-transforms and
    // re-hashes the whole landing directory every time)
    val q2 = StreamingRelease.attach(
      Ingest.streamJsonl(spark, land, schema), state, out, Some(ckpt))
    try {
      q2.processAllAvailable()
      val replayed = q2.recentProgress.map(_.numInputRows).sum
      assert(replayed == 0L, s"restart replayed $replayed rows")
      landWave(docs.filter(col("doc_id") >= n / 2), "w1")
      q2.processAllAvailable()
    } finally q2.stop()
    val got = StreamingRelease.released(spark, out)
      .collect().map(_.toSeq).toSeq
    val expected = graft.SparkEntry.queries("p_release_pipeline")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(got == expected, s"stream ${got.size} rows vs batch ${expected.size}")
  }

  test("duplicate texts across batches: only the first arrival releases; redelivery is idempotent") {
    import spark.implicits._
    val state = tmp("graft_rel2_state_")
    val out = tmp("graft_rel2_out_")
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val b1 = Seq((1L, words, "src0"), (2L, words, "src1"),
      (3L, "short text", "src0")).toDF("doc_id", "text", "source")
    val b2 = Seq((9L, words, "src3"),
      (10L, words + " tail", "src4")).toDF("doc_id", "text", "source")
    StreamingRelease.processBatch(spark, b1, state, out)
    StreamingRelease.processBatch(spark, b2, state, out)
    val ids = StreamingRelease.released(spark, out)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    // 2 drops (intra-batch dup of 1), 3 drops (quality gate),
    // 9 drops (cross-batch dup of 1), 10 is novel
    assert(ids == Seq(1L, 10L), s"got $ids")
    // redeliver batch 2: the id-range-keyed write overwrites itself
    StreamingRelease.processBatch(spark, b2, state, out)
    val again = StreamingRelease.released(spark, out)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(again == Seq(1L, 10L), s"redelivery duplicated: $again")
  }
}
