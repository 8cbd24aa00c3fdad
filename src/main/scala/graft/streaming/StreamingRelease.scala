package graft.streaming

import org.apache.hadoop.fs.Path
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
  *  - Output AND state land under a directory keyed by the BATCH's
  *    full doc_id range (computed BEFORE the state probe), and the
  *    probe excludes the batch's own state directory — so a
  *    redelivered micro-batch recomputes the identical novel set even
  *    if the crash left its own state partially written, and its
  *    overwrite replaces rather than duplicates (the StreamingDocDedup
  *    idempotence contract, including the partial-state-write case).
  *
  * When arrival order matches doc_id order, first-arrival == the batch
  * row's min-doc_id survivor rule, and the released output is
  * row-identical to p_release_pipeline — StreamingReleaseSpec pins it.
  */
object StreamingRelease {

  /** seen/batch_* state directories via the Hadoop FS (portable to
    * hdfs/s3a paths, where java.io.File would silently report
    * nothing and disable dedup). */
  private def seenBatchDirs(spark: SparkSession, statePath: String): Seq[String] = {
    val pattern = new Path(s"$statePath/seen/batch_*")
    val fs = pattern.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hits = fs.globStatus(pattern)
    if (hits == null) Seq.empty else hits.map(_.getPath.toString).toSeq
  }

  /** One micro-batch: transform, gate, dedup vs state, append output +
    * state. Exposed for direct testing. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   statePath: String, outPath: String): Unit = {
    val staged = graft.queries.Curation.releaseTransform(batch)
      .filter(col("n_tok") >= 30)
      .withColumn("tkey", xxhash64(col("text")))
      .localCheckpoint(true)
    // the redelivery key is the BATCH's id range (state-independent:
    // derived before any probe, so a partial prior state write cannot
    // change it)
    val idr = staged.agg(min(col("doc_id")), max(col("doc_id"))).head
    if (idr.isNullAt(0)) return
    val tag = s"batch_${idr.getLong(0)}_${idr.getLong(1)}"
    // intra-batch: first arrival (min doc_id) per text key
    val firsts = staged
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tkey")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    // probe every OTHER batch's state: excluding our own makes a
    // redelivered batch blind to its earlier (possibly partial) writes
    val others = seenBatchDirs(spark, statePath)
      .filterNot(_.endsWith(s"/$tag"))
    val novel = (if (others.nonEmpty) {
      val seen = spark.read.parquet(others: _*)
      firsts.join(seen, Seq("tkey"), "left_anti")
    } else firsts).localCheckpoint(true)
    // coalesce(1): per-batch novel sets are small; shuffle-partition-
    // many part files here would hand every later probe the small-files
    // pathology compactDir exists to fix
    novel.select(col("doc_id"), col("n_tok"),
        col("n_email"), col("n_phone"), col("n_ip"), col("released"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outPath/$tag")
    novel.select(col("tkey"))
      .coalesce(1).write.mode("overwrite").parquet(s"$statePath/seen/$tag")
  }

  /** Attach to a (doc_id, text, source) stream. Pass `checkpointLocation`
    * for restartable deployments: without it Spark assigns a TEMPORARY
    * checkpoint, so a restarted application replays the whole source —
    * the state probe keeps results exactly-once regardless, but every
    * landed file is re-transformed and re-hashed on each restart. */
  def attach(stream: DataFrame, statePath: String,
             outPath: String,
             checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append").foreachBatch {
      (b: DataFrame, _: Long) =>
        processBatch(b.sparkSession, b, statePath, outPath)
    }
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w.start()
  }

  /** Everything released so far, ascending doc_id (empty frame before
    * the first batch lands — never a path error). */
  def released(spark: SparkSession, outPath: String): DataFrame = {
    val pattern = new Path(s"$outPath/batch_*")
    val fs = pattern.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hits = fs.globStatus(pattern)
    if (hits == null || hits.isEmpty)
      spark.range(0).select(col("id").as("doc_id"), lit(0L).as("n_tok"),
        lit(0L).as("n_email"), lit(0L).as("n_phone"), lit(0L).as("n_ip"),
        lit("").as("released"))
    else spark.read.parquet(s"$outPath/batch_*").orderBy(col("doc_id"))
  }
}
