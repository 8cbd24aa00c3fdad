package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.hnsw.HnswRouted
import graft.hnsw.HnswRouted.RoutedIndex

/** Structured-Streaming ingest for the IVF-ROUTED serving tier: each
  * micro-batch routes by cell and merges per cell through
  * [[HnswRouted.ingest]] — the batch shuffles once on the cell id, the
  * index side never moves (narrow dependency on its pinned
  * partitioner). The evolving index lives in a [[Handle]] the serving
  * path reads between batches (single-writer foreachBatch contract,
  * same shape as [[StreamingIngest.IncrementalIndex]]).
  *
  * Durability composes with the versioned save: pass a checkpoint
  * (path, everyNBatches) and the handle persists a complete
  * [[HnswRouted.save]] version on that cadence — restart =
  * [[HnswRouted.attach]] + source replay from the last saved batch.
  * (Each save is O(index) write volume — a checkpoint cadence, not a
  * per-batch delta; the O(batch)-per-batch durable discipline lives in
  * the single-graph LSM tier, [[StreamingIngest.attachDurable]].)
  */
object StreamingRouted {

  /** Mutable routed-index handle shared across micro-batches; volatile
    * so serving threads see the latest fold. */
  final class Handle(@volatile var index: RoutedIndex) {
    def cellStats: Array[(Int, Long)] = HnswRouted.cellStats(index)
  }

  /** Wire `stream` (id: long, vec: array<float>) into the handle via
    * foreachBatch. Empty batches skip the INGEST (no index churn) but
    * still advance the checkpoint cadence — tracked as batches-since-
    * last-save, so an empty micro-batch landing on the boundary defers
    * the save at most until the next non-empty batch instead of
    * silently stretching the restart replay window by a full cadence. */
  def attach(stream: DataFrame, handle: Handle,
             checkpoint: Option[(String, Int)] = None): StreamingQuery = {
    // single-writer foreachBatch contract: one callback at a time, so
    // plain vars are safe here
    var sinceSave = 0
    var unsavedIngests = 0
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          handle.index = HnswRouted.ingest(handle.index, batch)
          unsavedIngests += 1
        }
        sinceSave += 1
        checkpoint.foreach { case (path, every) =>
          // save once the cadence has elapsed AND there is anything new
          // to persist (a window of only empty batches checkpoints
          // nothing; unsaved ingests from earlier in the window still
          // save even when the boundary batch itself is empty)
          if (every > 0 && sinceSave >= every && unsavedIngests > 0) {
            HnswRouted.save(handle.index, path)
            sinceSave = 0
            unsavedIngests = 0
          }
        }
      }
      .start()
  }
}
