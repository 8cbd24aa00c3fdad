package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the release-pipeline capstone: the same stateless
  * stage chain ([[graft.queries.Curation.releaseTransform]] — ONE
  * definition, the stream and the batch row cannot drift) applied per
  * micro-batch, with the exact-dedup stage as durable FIRST-ARRIVAL
  * state instead of a min-doc_id window:
  *
  *  - `seen/` holds one 64-bit xxhash per released text (the 8-byte
  *    anchor-key pattern: probes and state stay narrow at corpus
  *    scale; a 64-bit collision silently drops a novel doc — the
  *    documented trade of every hash-keyed dedup tier here).
  *  - A batch's novel docs are those whose text hash misses `seen`
  *    (left-anti, O(batch) probe rows) minus intra-batch later
  *    arrivals (min-doc_id window INSIDE the batch, where ascending
  *    doc_id is the arrival order — the StreamingIngest contract).
  *  - Batch output lands under an id-range-keyed subdirectory, so a
  *    redelivered micro-batch overwrites its own files instead of
  *    duplicating (the StreamingDocDedup idempotence pattern).
  *
  * When arrival order matches doc_id order, first-arrival == the batch
  * row's min-doc_id survivor rule, and the released output is
  * row-identical to p_release_pipeline — StreamingReleaseSpec pins it.
  */
object StreamingRelease {

  /** One micro-batch: transform, gate, dedup vs state, append output +
    * state. Exposed for direct testing. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   statePath: String, outPath: String): Unit = {
    if (batch.isEmpty) return
    val staged = graft.queries.Curation.releaseTransform(batch)
      .filter(col("n_tok") >= 30)
      .withColumn("tkey", xxhash64(col("text")))
    // intra-batch: first arrival (min doc_id) per text key
    val firsts = staged
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tkey")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    // batch subdirectories need the glob read (a bare directory read
    // would try to infer a schema from the child DIRS and fail)
    val seenDir = new java.io.File(s"$statePath/seen")
    val hasSeen = seenDir.exists() &&
      seenDir.listFiles().exists(_.getName.startsWith("batch_"))
    val novel = (if (hasSeen) {
      val seen = spark.read.parquet(s"$statePath/seen/batch_*")
      firsts.join(seen, Seq("tkey"), "left_anti")
    } else firsts).localCheckpoint(true)
    // id-range key: redelivery overwrites, never duplicates
    val ids = novel.agg(min(col("doc_id")), max(col("doc_id"))).head
    if (!ids.isNullAt(0)) {
      val tag = s"${ids.getLong(0)}_${ids.getLong(1)}"
      novel.select(col("doc_id"), col("n_tok"),
          col("n_email"), col("n_phone"), col("n_ip"), col("released"))
        .write.mode("overwrite").parquet(s"$outPath/batch_$tag")
      novel.select(col("tkey"))
        .write.mode("overwrite").parquet(s"$statePath/seen/batch_$tag")
    }
  }

  /** Attach to a (doc_id, text, source) stream. */
  def attach(stream: DataFrame, statePath: String,
             outPath: String): StreamingQuery =
    stream.writeStream.outputMode("append").foreachBatch {
      (b: DataFrame, _: Long) =>
        processBatch(b.sparkSession, b, statePath, outPath)
    }.start()

  /** Everything released so far, ascending doc_id. */
  def released(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/batch_*").orderBy(col("doc_id"))
}
