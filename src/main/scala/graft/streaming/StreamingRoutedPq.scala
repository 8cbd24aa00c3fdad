package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.hnsw.{HnswRouted, HnswRoutedPq}
import graft.hnsw.HnswRouted.RoutedIndex
import graft.hnsw.HnswRoutedPq.RoutedPqIndex

/** CDC streaming for the routed+PQ serving tier: the PQ index is
  * DERIVED state (per-cell ADC codes over the float tier's cell
  * graphs), so the stream mutates the FLOAT source through the exact
  * [[StreamingRouted]] CDC semantics — delete-wins nets, tombstone and
  * redelivery filters, threshold compaction — and then re-derives the
  * PQ tier incrementally ([[HnswRoutedPq.rederive]]): cells the batch
  * never touched carry their codes over by reference (the content
  * fingerprint gates it), so the per-batch PQ cost is O(touched cells)
  * encode work, not O(index).
  *
  * Delete-only batches never touch any shard on either tier: the float
  * step is O(set) tombstone metadata, and the PQ handle just adopts
  * the new tombstone set (detected by the float shards RDD being
  * unchanged — zero jobs).
  *
  * Durability composes exactly like [[StreamingRouted.attachCdc]]: the
  * checkpoint persists the FLOAT image ([[HnswRouted.save]], which
  * carries the tombstone set); restart = [[HnswRouted.attach]] +
  * [[HnswRoutedPq.fromRoutedWith]] with the codebook + source replay.
  * The codebook itself is a few KB of driver state — the caller owns
  * persisting it beside the checkpoint (it is plain float arrays;
  * any serialization works), or re-trains via [[HnswRoutedPq
  * .fromRouted]] accepting a one-time recall drift on restart.
  */
object StreamingRoutedPq {

  /** Mutable two-tier handle shared across micro-batches; volatile so
    * serving threads see the latest fold of either tier. Serving reads
    * `pq` (the compressed tier); `float` is the lifecycle source. */
  final class Handle(@volatile var float: RoutedIndex,
                     @volatile var pq: RoutedPqIndex)

  /** Wire a CDC stream — `(id, vec, op)` rows, op `"insert"`/`"upsert"`
    * or `"delete"` — into the two-tier handle via foreachBatch. */
  def attachCdc(stream: DataFrame, handle: Handle,
                checkpoint: Option[(String, Int)] = None,
                compactThreshold: Double = 0.2): StreamingQuery = {
    var sinceSave = 0
    var unsavedOps = 0
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val before = handle.float
          val (next, ops) = StreamingRouted.cdcStep(before, batch,
            compactThreshold)
          handle.float = next
          unsavedOps += ops
          if (ops > 0) {
            if (next.shards eq before.shards) {
              // tombstone-only batch: no cell changed — adopt the set,
              // keep every code block (zero jobs)
              handle.pq = handle.pq.copy(tombstones = next.tombstones)
            } else {
              handle.pq = HnswRoutedPq.rederive(handle.pq, next,
                unpersistPrior = true)
            }
          }
        }
        sinceSave += 1
        checkpoint.foreach { case (path, every) =>
          if (every > 0 && sinceSave >= every && unsavedOps > 0) {
            HnswRouted.save(handle.float, path)
            sinceSave = 0
            unsavedOps = 0
          }
        }
      }
      .start()
  }
}
