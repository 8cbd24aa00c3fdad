package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.hnsw.{HnswDistributed, HnswParams}
import graft.sources.Avro
import graft.streaming.StreamingIngest.IncrementalIndex

/** Streaming Avro message ingest: base64-lines shards tailed from a
  * landing directory, decoded inline by avro_decode, feeding the
  * two-phase index ingest — batch parity and corrupt-payload
  * quarantine parity with AvroSpec's batch contract.
  */
class StreamingAvroSpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files
    .createTempDirectory(p).toString

  private val msgSchema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("vec", ArrayType(FloatType, containsNull = true), nullable = true)))

  private def vecsOf(n: Int, offset: Long = 0L): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(offset + 77)
    (0 until n).map(i => (offset + i, Seq.fill(8)(rng.nextGaussian().toFloat)))
  }

  private def toDf(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }, 2),
      msgSchema)

  test("stream decode equals batch decode over the same landed shards") {
    val land = tmp("graft_savro_land_")
    val rows = vecsOf(50)
    Avro.writeMessageLines(toDf(rows), land)
    val schemaJson = Avro.avroSchemaFor(msgSchema).toString

    val batch = Avro.readMessageLines(spark, land, schemaJson)
      .filter(col("m").isNotNull).select(col("m.*"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)

    val sink = tmp("graft_savro_sink_")
    val ckpt = tmp("graft_savro_ckpt_")
    val q = Avro.streamMessageLines(spark, land, schemaJson)
      .filter(col("m").isNotNull).select(col("m.*"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)

    assert(streamed.length == 50)
    assert(streamed.toSeq == batch.toSeq,
      "stream and batch decode must agree row for row")
    assert(streamed.toSeq == rows.sortBy(_._1),
      "decoded rows must equal the produced rows (lossless bus)")
  }

  test("corrupt payloads null-route in the stream; good rows keep flowing") {
    val land = tmp("graft_savro2_land_")
    val rows = vecsOf(20)
    Avro.writeMessageLines(toDf(rows), land)
    // three poisoned shards: garbage base64, a truncated payload, and
    // a valid-base64 random blob — the AvroSpec quarantine matrix
    java.nio.file.Files.write(
      java.nio.file.Path.of(land, "poison.txt"),
      java.util.Arrays.asList(
        "!!!not-base64!!!",
        java.util.Base64.getEncoder.encodeToString(Array[Byte](1)),
        java.util.Base64.getEncoder.encodeToString(
          Array.tabulate[Byte](16)(_.toByte))))
    val schemaJson = Avro.avroSchemaFor(msgSchema).toString
    val sink = tmp("graft_savro2_sink_")
    val ckpt = tmp("graft_savro2_ckpt_")
    // land BOTH sides so the good/quarantine split is auditable
    val q = Avro.streamMessageLines(spark, land, schemaJson)
      .select(col("m"), col("m").isNull.as("quarantined"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(sink)
    assert(out.filter(!col("quarantined")).count() == 20,
      "every good message must survive the poisoned shard")
    assert(out.filter(col("quarantined")).count() >= 2,
      "poisoned payloads must null-route, not kill the stream")
  }

  test("landed messages feed the two-phase index ingest; inserted vectors self-match") {
    val land = tmp("graft_savro3_land_")
    val ckpt = tmp("graft_savro3_ckpt_")
    val wave1 = vecsOf(30)
    val wave2 = vecsOf(30, offset = 30)
    val schemaJson = Avro.avroSchemaFor(msgSchema).toString
    // wave 1 lands before attach; wave 2 while the stream is live —
    // shards must sit FLAT in the landing dir (the text source does
    // not recurse), so stage-and-move like the JSONL release spec
    def landWave(rows: Seq[(Long, Seq[Float])], tag: String): Unit = {
      val stage = tmp(s"graft_savro3_w_$tag")
      Avro.writeMessageLines(toDf(rows), stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Path.of(land, s"${tag}_$i.txt"))
        }
    }
    landWave(wave1, "w0")
    val cfg = BuildConfig(HnswParams.standard(32, 32, 8), "cosine", seed = 5L)
    val index = new IncrementalIndex(cfg)
    val decoded = Avro.streamMessageLines(spark, land, schemaJson)
      .filter(col("m").isNotNull)
      .select(col("m.id").as("id"), col("m.vec").as("vec"))
    val q = StreamingIngest.attach(decoded, index)
    try {
      q.processAllAvailable()
      assert(index.size == 30, s"wave 1: ${index.size}")
      landWave(wave2, "w1")
      q.processAllAvailable()
      assert(index.size == 60, s"wave 2: ${index.size}")
    } finally q.stop()
    val all = toDf(wave1 ++ wave2).toDF("qid", "qvec")
    val sm = HnswDistributed.search(all, index.model, 1)
    assert(sm.filter(col("qid") === col("id")).count() == 60,
      "every bus-ingested vector must self-match in the index")
  }
}
