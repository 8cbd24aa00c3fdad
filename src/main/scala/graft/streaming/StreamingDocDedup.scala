package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-duplicate document dedup — the arrival-order twin of the
  * batch MinHash pipeline (d_neardup_minhash → d_dedup_resolve): a doc
  * survives iff it matches nothing that already survived. State is a
  * durable parquet signature store, NOT driver memory, so the deduped
  * stream can exceed any single machine:
  *
  *  - `bands/`    (doc_id, band_idx, band_val): banded K-minhash
  *    signatures of every SURVIVOR — the LSH candidate index. A new doc
  *    probes it with an equi-join on (band_idx, band_val): cost is
  *    O(batch × bands) lookup rows, never a scan of the corpus.
  *  - `shingles/` (doc_id, sh): exact distinct char-8-shingle sets of
  *    survivors, read back only for docs the band probe flagged — verify
  *    cost stays proportional to candidates (the same two-stage shape as
  *    the batch queries, same kernel, same 9|I| >= 4(|A|+|B|) integer
  *    Jaccard-0.8 test).
  *
  * Semantics: micro-batches are the sequential unit (the
  * [[StreamingIngest]] contract); within a batch, ascending doc_id. A doc
  * is dropped iff it verifies against a prior survivor (earlier batch, or
  * earlier-id survivor of the same batch). Greedy arrival-order dedup is
  * NOT component resolution: in a chain A~B, B~C (A≁C), batch mode keeps
  * {A} of {A,B,C}'s component only if A~C too — greedy keeps A and C.
  * That is the correct online semantics (C arrived, matched nothing
  * live, so it is novel content) and the one an ingestion firehose needs.
  *
  * Only the intra-batch pair graph and the per-doc matched flags are
  * collected — O(batch), never O(corpus). Batch writes land under an
  * id-range-keyed directory, so a redelivered micro-batch overwrites its
  * own output instead of duplicating (the attachDurable idempotence
  * pattern).
  */
object StreamingDocDedup {

  // Parameters mirror DedupQueries: K=12 md5 min-hashes over distinct
  // char-8-shingles, 3 bands x 4 rows, exact verify at Jaccard 0.8.
  private val ShingleLen = 8
  private val MinhashK = 12
  private val Bands = 3
  private val RowsPerBand = 4

  final case class BatchResult(kept: Long, dropped: Long)

  private def bandsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.md5MinHashShingles(
        col("text"), ShingleLen, MinhashK, Bands, RowsPerBand))
        .as(Seq("band_idx", "band_val")))

  private def shinglesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextFunctions
        .charShingles(col("text"), ShingleLen).as("sh"))

  private def exists(s: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Verified matches between (a_sh-carrying) pairs — THE batch verify
    * (one shared kernel, see TextFunctions.jaccardAtLeast08). */
  private def verified(pairs: DataFrame): DataFrame =
    pairs.filter(graft.functions.TextFunctions
      .jaccardAtLeast08(col("a_sh"), col("b_sh")))

  /** Process one micro-batch of (doc_id, text) against the state at
    * `statePath`. Stateless on the driver between calls — restart = just
    * keep calling with the same path. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   statePath: String): BatchResult = {
    // null ids cannot participate (the driver-side getLong would NPE on
    // every redelivery — a permanent crash loop); identical-id repeats
    // within one at-least-once batch would duplicate every signature
    // row in the state and double-count in the greedy pass
    val docs = batch.select(col("doc_id").cast("long"), col("text"))
      .filter(col("doc_id").isNotNull)
      .dropDuplicates("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (docs.isEmpty) return BatchResult(0, 0)
      val bands = bandsOf(docs).persist()
      val sh = shinglesOf(docs).persist()
      try {
        // --- cross candidates: probe the survivor band index.
        // State rows whose id belongs to THIS batch are excluded: on a
        // redelivered batch they are the batch's own previous output, and
        // matching against them would drop every former survivor as a
        // "duplicate" of itself — then overwrite the state dir with zero
        // rows. With them excluded the probe sees exactly what the first
        // delivery saw, the greedy pass recomputes the identical survivor
        // set, and the overwrite rewrites identical content (the
        // idempotence contract). Batch-internal duplicates are entirely
        // the intra-batch stage's job.
        val batchIds = docs.select(col("doc_id"))
        val crossMatched: Set[Long] =
          if (!exists(spark, s"$statePath/bands")) Set.empty
          else {
            val stBands = spark.read.parquet(s"$statePath/bands")
              .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
              .select(col("doc_id").as("k_id"), col("band_idx"), col("band_val"))
            val cand = bands.join(stBands, Seq("band_idx", "band_val"))
              .select(col("doc_id"), col("k_id")).distinct()
            val candK = cand.select(col("k_id")).distinct()
            // shingle sets of flagged survivors only (semi-join shape)
            val stSh = spark.read.parquet(s"$statePath/shingles")
              .join(broadcast(candK),
                col("doc_id") === col("k_id"), "left_semi")
              .select(col("doc_id").as("k_id"), col("sh").as("b_sh"))
            verified(cand
                .join(sh.select(col("doc_id"), col("sh").as("a_sh")), "doc_id")
                .join(stSh, "k_id"))
              .select(col("doc_id")).distinct()
              .collect().map(_.getLong(0)).toSet
          }

        // --- intra-batch candidates: banded self-join, ascending pairs
        val intraPairs: Array[(Long, Long)] = verified(
            bands.as("x").join(bands.as("y"),
                col("x.band_idx") === col("y.band_idx") &&
                  col("x.band_val") === col("y.band_val") &&
                  col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
              .distinct()
              .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
              .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id"))
          .select(col("a_id"), col("b_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))

        // --- greedy arrival-order resolution (driver, O(batch))
        val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
        val dupOfEarlier = intraPairs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
        val surviving = scala.collection.mutable.LinkedHashSet.empty[Long]
        ids.foreach { id =>
          val dropped = crossMatched.contains(id) ||
            dupOfEarlier.getOrElse(id, Array.empty[Long]).exists(surviving.contains)
          if (!dropped) surviving += id
        }

        // --- persist survivors' signatures (id-range-keyed, idempotent)
        val (lo, hi) = (ids.head, ids.last)
        import spark.implicits._
        val survDf = surviving.toSeq.toDF("doc_id")
        bands.join(broadcast(survDf), "doc_id")
          .write.mode("overwrite").parquet(s"$statePath/bands/batch=${lo}_$hi")
        sh.join(broadcast(survDf), "doc_id")
          .write.mode("overwrite").parquet(s"$statePath/shingles/batch=${lo}_$hi")
        BatchResult(surviving.size.toLong, ids.length - surviving.size.toLong)
      } finally { bands.unpersist(); sh.unpersist() }
    } finally docs.unpersist()
  }

  /** Surviving doc ids accumulated in the state. */
  def keptIds(spark: SparkSession, statePath: String): DataFrame =
    if (!exists(spark, s"$statePath/shingles"))
      spark.range(0).select(col("id").as("doc_id"))
    else spark.read.parquet(s"$statePath/shingles").select(col("doc_id"))

  /** Attach a streaming (doc_id, text) frame: every micro-batch is
    * deduped against (and folded into) the durable signature state. */
  def attach(stream: DataFrame, statePath: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, statePath)
        ()
      }
      .start()
}
