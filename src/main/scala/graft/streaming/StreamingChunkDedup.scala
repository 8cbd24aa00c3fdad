package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming chunk-level exact dedup — the arrival-order twin of the
  * batch [[graft.operators.ChunkDedup]] keep-first pass: a chunk
  * occurrence survives iff its exact content was never seen before
  * (earlier batch, or earlier (doc_id, chunk_no) in the same batch).
  * The boilerplate-stripping stage of a streaming ingestion pipeline.
  *
  * State is a durable parquet chunk-hash index (`chunks/`: chunk_hash,
  * first_doc, first_chunk_no), NOT driver memory. Each micro-batch:
  *
  *  - probes the state with a LEFT SEMI against the batch's own hash set
  *    broadcast (the hit set is O(batch), never O(corpus) shuffled);
  *  - resolves intra-batch repeats with one window over chunk_hash
  *    (keep-first in global (doc_id, chunk_no) order);
  *  - appends the fresh survivors under an epoch-keyed directory, so a
  *    redelivered micro-batch overwrites its own output instead of
  *    duplicating: state rows written under THIS batch key are excluded
  *    from the probe, so the recomputation sees exactly what the first
  *    delivery saw — and a doc id reappearing in a LATER batch still
  *    dedups against the earlier occurrence (the exclusion is keyed on
  *    the batch, never on doc-id membership).
  *
  * The state is BUCKETED by chunk_hash (hive-style `bucket=` partition
  * dirs under each batch dir): the probe lists only the buckets the
  * incoming batch actually touches, so probe I/O scales with the BATCH's
  * bucket footprint (<= min(batch chunks, nBuckets)/nBuckets of the
  * state), not with corpus size. The exclusion of the batch's own prior
  * output on redelivery rides the same partition column (`batch=`), so
  * both filters prune at file-listing time — no state row outside the
  * touched buckets of other batches is ever read.
  */
object StreamingChunkDedup {

  final case class BatchResult(chunks: Long, kept: Long, dropped: Long)

  /** State bucket count. 64 keeps per-bucket files big enough at test
    * scale; a production deployment sizes it so one bucket of one batch
    * is a few hundred MB. */
  val DefaultBuckets = 64

  private def bucketOf(nBuckets: Int) =
    pmod(xxhash64(col("chunk_hash")), lit(nBuckets.toLong))

  /** Explicit read schema for the state. Declaring the `batch` partition
    * column STRING matters for correctness, not just hygiene: left to
    * partition-type inference, a numeric-looking key like "007" is read
    * as int 7 and renders back as "7", so an inferred-value comparison
    * against the raw key would FAIL to exclude the batch's own rows on
    * redelivery — every former first-occurrence would drop as a
    * duplicate of itself and the overwrite would erase it from the
    * index. With the user schema the directory string is taken
    * literally and the exclusion is exact for every legal key. */
  private val stateSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("chunk_hash",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("first_doc",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("first_chunk_no",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("batch",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.LongType)))

  /** The pruned state read: rows of OTHER batches in the TOUCHED buckets
    * only — both predicates are partition-column filters, evaluated
    * against the directory listing before any parquet is opened.
    * Package-private so the spec can assert the pruning on the plan. */
  private[streaming] def probeState(spark: SparkSession, statePath0: String,
                                    excludeBatchKey: String,
                                    touchedBuckets: Seq[Long]): DataFrame =
    spark.read.schema(stateSchema).parquet(statePath0)
      .filter(col("batch") =!= excludeBatchKey &&
        col("bucket").isin(touchedBuckets: _*))
      .select(col("chunk_hash"))

  private def exists(s: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Process one micro-batch of (doc_id, text) against the state at
    * `statePath`. Stateless on the driver between calls. `batchKey`
    * must be stable across redeliveries of the SAME batch and distinct
    * between different batches — exactly the contract of foreachBatch's
    * epoch id, which [[attach]] passes. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   statePath: String, batchKey: String,
                   w: Int = 20, nBuckets: Int = DefaultBuckets): BatchResult = {
    require(batchKey.matches("[A-Za-z0-9_.-]+"), s"unsafe batchKey: $batchKey")
    val docs = batch.select(col("doc_id").cast("long"), col("text"))
      .filter(col("doc_id").isNotNull)
      .dropDuplicates("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (docs.isEmpty) return BatchResult(0, 0, 0)
      val occ = graft.operators.ChunkDedup.occurrences(docs, w)
        .withColumn("chunk_hash", md5(col("chunk").cast("binary")))
        .withColumn("bucket", bucketOf(nBuckets))
        .persist()
      try {
        val nOcc = occ.count()
        val statePath0 = s"$statePath/chunks"
        val ownDir = s"batch=$batchKey"
        // The batch's bucket footprint — bounded by nBuckets, so this
        // collect is O(64), never O(batch) or O(corpus).
        val touched = occ.select(col("bucket")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        // hashes already owned by SURVIVORS of earlier batches, read
        // through the partition-pruned probe: only the TOUCHED buckets
        // of OTHER batch dirs are listed/opened. Rows written by THIS
        // batch key are excluded BY PARTITION: on redelivery they are
        // the batch's own previous output, and probing them would drop
        // every former first-occurrence as a duplicate of itself.
        // Keying the exclusion on the batch id (not on first_doc
        // membership) keeps a REAPPEARING doc id in a later batch
        // correct too: its chunks stay "seen" and dedup against the
        // earlier occurrence instead of corrupting the index with a
        // second first-occurrence row.
        val seenHashes: DataFrame =
          if (!exists(spark, statePath0))
            spark.range(0).select(col("id").cast("string").as("chunk_hash"))
          else probeState(spark, statePath0, batchKey, touched)
            .join(broadcast(occ.select(col("chunk_hash")).distinct()),
              Seq("chunk_hash"), "left_semi")
            .select(col("chunk_hash")).distinct()
        val fresh = occ
          .join(broadcast(seenHashes), Seq("chunk_hash"), "left_anti")
        val surv = fresh
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("chunk_hash"))
              .orderBy(col("doc_id"), col("chunk_no"))))
          .filter(col("rn") === 1)
          .select(col("chunk_hash"), col("bucket"),
            col("doc_id").as("first_doc"),
            col("chunk_no").as("first_chunk_no"))
          .persist()
        val nKept = surv.count()
        // static partition-overwrite of the whole batch dir: redelivery
        // replaces the batch's previous output atomically even if the
        // recomputed bucket set shrank
        surv.write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$statePath0/$ownDir")
        surv.unpersist(blocking = false)
        BatchResult(nOcc, nKept, nOcc - nKept)
      } finally occ.unpersist()
    } finally docs.unpersist()
  }

  /** Every distinct chunk's first occurrence accumulated in the state. */
  def seenChunks(spark: SparkSession, statePath: String): DataFrame =
    if (!exists(spark, s"$statePath/chunks"))
      spark.range(0).selectExpr("CAST(id AS STRING) AS chunk_hash",
        "id AS first_doc", "id AS first_chunk_no")
    else spark.read.parquet(s"$statePath/chunks")
      .select(col("chunk_hash"), col("first_doc"), col("first_chunk_no"))

  /** Attach a streaming (doc_id, text) frame: every micro-batch is
    * deduped against (and folded into) the durable chunk index. */
  def attach(stream: DataFrame, statePath: String, w: Int = 20): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // epoch id: stable on redelivery, distinct across batches —
        // exactly the idempotence key processBatch requires
        processBatch(batch.sparkSession, batch, statePath, epochId.toString, w)
        ()
      }
      .start()
}
