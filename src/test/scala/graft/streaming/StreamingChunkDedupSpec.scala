package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ChunkDedup

/** Streaming chunk dedup vs the batch keep-first reference, cross-batch
  * suppression, and redelivery idempotence. */
class StreamingChunkDedupSpec extends SparkSpec {

  import spark.implicits._

  private val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
  private def uniq(tag: String) = (1 to 20).map(i => s"${tag}$i").mkString(" ")

  private val batch1 = Seq(
    (1L, uniq("x") + " " + boiler),
    (2L, boiler + " " + uniq("y")))
  private val batch2 = Seq(
    (3L, boiler + " " + uniq("z")), // boiler dup of batch 1
    (4L, uniq("z") + " " + uniq("w")), // intra-batch dup of doc 3's z-chunk
    (5L, uniq("v")))

  private def freshState(): String =
    Files.createTempDirectory("graft_chunkstream_").toString

  test("streamed state equals the batch keep-first firsts over the union") {
    val state = freshState()
    val r1 = StreamingChunkDedup.processBatch(spark, batch1.toDF("doc_id", "text"), state, "b1")
    val r2 = StreamingChunkDedup.processBatch(spark, batch2.toDF("doc_id", "text"), state, "b2")
    assert(r1.chunks == 4 && r1.kept == 3) // boiler repeats within batch 1
    assert(r2.chunks == 5 && r2.kept == 3) // boiler dropped, z kept once

    val got = StreamingChunkDedup.seenChunks(spark, state)
      .select("chunk_hash", "first_doc", "first_chunk_no")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = ChunkDedup
      .occurrences((batch1 ++ batch2).toDF("doc_id", "text"), 20)
      .withColumn("chunk_hash", md5(col("chunk").cast("binary")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_no"))))
      .filter(col("rn") === 1)
      .select("chunk_hash", "doc_id", "chunk_no")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("redelivered batch is idempotent: same state, same counts") {
    val state = freshState()
    StreamingChunkDedup.processBatch(spark, batch1.toDF("doc_id", "text"), state, "b1")
    val first = StreamingChunkDedup.processBatch(spark, batch2.toDF("doc_id", "text"), state, "b2")
    val stateAfterFirst = StreamingChunkDedup.seenChunks(spark, state)
      .collect().map(_.toString).sorted.toSeq
    val redelivered = StreamingChunkDedup.processBatch(spark, batch2.toDF("doc_id", "text"), state, "b2")
    val stateAfterRedeliver = StreamingChunkDedup.seenChunks(spark, state)
      .collect().map(_.toString).sorted.toSeq
    assert(redelivered == first)
    assert(stateAfterRedeliver == stateAfterFirst)
  }

  test("a reappearing doc id dedups against its earlier occurrence") {
    // doc 1 re-sent in a LATER batch (a new epoch, not a redelivery):
    // its chunks are already owned by the state, so they all drop, and
    // the index gains no second first-occurrence row
    val state = freshState()
    StreamingChunkDedup.processBatch(spark, batch1.toDF("doc_id", "text"), state, "b1")
    val before = StreamingChunkDedup.seenChunks(spark, state)
      .collect().map(_.toString).sorted.toSeq
    val r = StreamingChunkDedup.processBatch(
      spark, batch1.take(1).toDF("doc_id", "text"), state, "b9")
    assert(r.kept == 0 && r.dropped == r.chunks)
    val after = StreamingChunkDedup.seenChunks(spark, state)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("state probe prunes by partition: only touched buckets of other batches are listed") {
    val state = freshState()
    // many docs across many buckets in the state...
    val big = (10L to 60L).map(i => (i, uniq(s"s${i}_"))).toDF("doc_id", "text")
    StreamingChunkDedup.processBatch(spark, big, state, "b1")
    // ...then a tiny batch: its probe must touch ONLY its own buckets
    val tiny = Seq((100L, uniq("t"))).toDF("doc_id", "text")
    val occ = ChunkDedup.occurrences(tiny, 20)
      .withColumn("chunk_hash", md5(col("chunk").cast("binary")))
      .withColumn("bucket",
        pmod(xxhash64(col("chunk_hash")), lit(StreamingChunkDedup.DefaultBuckets.toLong)))
    val touched = occ.select("bucket").distinct().collect().map(_.getLong(0)).toIndexedSeq

    val probe = StreamingChunkDedup.probeState(spark, s"$state/chunks", "b2", touched)
    val scans = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val pf = scans.flatMap(_.partitionFilters).map(_.sql).mkString(" ")
    // both predicates reached the scan as PARTITION filters — evaluated
    // against the directory listing, before any parquet file is opened
    assert(pf.toLowerCase.contains("bucket"), s"bucket filter not a partition filter: $pf")
    assert(pf.toLowerCase.contains("batch"), s"batch filter not a partition filter: $pf")
    // and the pruned read lists at most the touched-bucket partitions,
    // not the state's full bucket footprint
    val allBuckets = spark.read.parquet(s"$state/chunks")
      .select("bucket").distinct().count()
    val listed = scans.map(_.selectedPartitions.partitionCount).sum
    assert(listed <= touched.size, s"listed $listed partitions for ${touched.size} touched buckets")
    assert(allBuckets > touched.size, "state must span more buckets than the tiny batch for this test to bite")
  }

  test("a batch key that breaks partition-type round-trip ('007') is still idempotent") {
    // partition inference would read batch=007 back as int 7 ("7" as a
    // string), so an inferred-value exclusion misses the batch's own
    // rows on redelivery and drops every first occurrence as a dup of
    // itself; the explicit STRING schema on the state read keeps the
    // directory value literal
    val state = freshState()
    val first = StreamingChunkDedup.processBatch(
      spark, batch1.toDF("doc_id", "text"), state, "007")
    val stateFirst = StreamingChunkDedup.seenChunks(spark, state)
      .collect().map(_.toString).sorted.toSeq
    val redelivered = StreamingChunkDedup.processBatch(
      spark, batch1.toDF("doc_id", "text"), state, "007")
    val stateAfter = StreamingChunkDedup.seenChunks(spark, state)
      .collect().map(_.toString).sorted.toSeq
    assert(redelivered == first, s"redelivery diverged: $redelivered vs $first")
    assert(redelivered.kept == 3L)
    assert(stateAfter == stateFirst)
  }

  test("null ids and duplicate ids within a batch are dropped, not crashed") {
    val state = freshState()
    val messy = Seq(
      (Option(7L), Option(uniq("q"))),
      (Option.empty[Long], Option(uniq("r"))),
      (Option(7L), Option(uniq("q"))))
      .toDF("doc_id", "text")
    val r = StreamingChunkDedup.processBatch(spark, messy, state, "b1")
    assert(r.chunks == 1 && r.kept == 1)
  }
}
