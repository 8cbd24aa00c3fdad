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

  /** SOLO handle: the PQ tier alone — no float source anywhere (the
    * attached-image posture). Serving threads read `pq` volatile. */
  final class SoloHandle(@volatile var pq: RoutedPqIndex)

  /** SOLO CDC — the float-source-free streaming loop for an attached
    * PQ tier: `(id, vec, op)` micro-batches mutate the compressed
    * index DIRECTLY through its solo lifecycle. Semantics mirror
    * [[StreamingRouted.cdcStep]] exactly (delete-wins nets in-batch,
    * tombstone + redelivery + already-live insert filters — the
    * lenient CDC posture where batch [[HnswRoutedPq.ingest]]
    * fail-fasts), with [[HnswRoutedPq.compactSolo]] as the threshold
    * fold: touched cells rebuild from `vectors`, the raw-vector table
    * the exact re-rank already reads — which must therefore cover
    * every id the index serves, INCLUDING streamed inserts (in a real
    * pipeline the upstream store; the caller owns that contract, and
    * compactSolo fail-fasts loudly on a gap).
    *
    * Durability: the checkpoint persists the PQ image itself
    * ([[HnswRoutedPq.save]] — codebook, codes, graphs, fingerprints,
    * tombstones); restart = [[HnswRoutedPq.attach]] + source replay.
    * No float image exists at any point in the loop. */
  def attachCdcSolo(stream: DataFrame, handle: SoloHandle,
                    vectors: DataFrame,
                    checkpoint: Option[(String, Int)] = None,
                    compactThreshold: Double = 0.2,
                    maxOverlayDepth: Int =
                      StreamingRouted.DefaultMaxOverlayDepth,
                    floatExact: Boolean = true): StreamingQuery = {
    var sinceSave = 0
    var unsavedOps = 0
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val (next, ops) = cdcStepSolo(handle.pq, batch, vectors,
            compactThreshold, maxOverlayDepth, floatExact)
          handle.pq = next
          unsavedOps += ops
        }
        sinceSave += 1
        checkpoint.foreach { case (path, every) =>
          if (every > 0 && sinceSave >= every && unsavedOps > 0) {
            // keepVersions = 2 + rebase-after-save: in THIS loop attach
            // is the sole serving source (the handle restores from this
            // very path on restart), so the live handle's RDD lineage
            // reads a version dir by construction — the old commit
            // behavior (reclaim everything but the newest version)
            // deleted the files that lineage recomputes from. The prior
            // version survives this save; the rebase moves the handle
            // (and all future lineage) onto the newest version before
            // the NEXT save reclaims the prior one.
            HnswRoutedPq.save(handle.pq, path, keepVersions = 2)
            val prior = handle.pq
            handle.pq = HnswRoutedPq.attach(batch.sparkSession, path)
            prior.unpersist()
            // probe the cold attached image off the serving path (the
            // StreamingRouted rebase discipline; ledger-tracked)
            graft.BuildLedger.timed("routed_pq_warm_probe")(
              HnswRoutedPq.warmProbe(handle.pq))
            sinceSave = 0
            unsavedOps = 0
          }
        }
      }
      .start()
  }

  /** One solo CDC micro-batch — [[StreamingRouted.cdcStep]]'s
    * semantics on the PQ tier's own lifecycle. Returns (next index,
    * mutating ops applied). */
  /** `floatExact` reaches the threshold fold's cell rebuilds
    * ([[HnswRoutedPq.compactSolo]]): false takes the buildSolo-kernel
    * rebuild — the serving-cadence choice (BASELINE round-18: solo
    * build-serve geometry at 0.94x plain, 7x cheaper rebuild);
    * default true preserves the float-exact graph contract. */
  private[streaming] def cdcStepSolo(index0: RoutedPqIndex,
                                     batch: DataFrame, vectors: DataFrame,
                                     compactThreshold: Double,
                                     maxOverlayDepth: Int =
                                       StreamingRouted.DefaultMaxOverlayDepth,
                                     floatExact: Boolean = true): (RoutedPqIndex, Int) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    var index = index0
    var ops = 0
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dels = b.filter(col("op") === "delete")
        .select(col("id").cast("long").as("id")).dropDuplicates("id")
      val delIds = dels.collect().map(_.getLong(0))
      java.util.Arrays.sort(delIds)
      if (delIds.nonEmpty) {
        index = HnswRoutedPq.delete(index, dels)
        ops += 1
      }
      val insAll = b.filter(col("op") =!= "delete")
        .select(col("id").cast("long").as("id"), col("vec"))
        .dropDuplicates("id")
      val insIds = insAll.select(col("id")).collect().map(_.getLong(0))
      java.util.Arrays.sort(insIds)
      val dead = index.tombstones
      val live = HnswRoutedPq.presentIds(index, insIds)
      val dropId: Long => Boolean = id =>
        java.util.Arrays.binarySearch(delIds, id) >= 0 ||
          java.util.Arrays.binarySearch(dead, id) >= 0 ||
          java.util.Arrays.binarySearch(live, id) >= 0
      val keep = insIds.filterNot(dropId)
      if (keep.nonEmpty) {
        val keepDf = insAll.sparkSession.createDataset(keep.toSeq)(
          org.apache.spark.sql.Encoders.scalaLong).toDF("id")
        index = HnswRoutedPq.ingest(index,
          insAll.join(broadcast(keepDf), Seq("id")),
          unpersistPrior = true)
        ops += 1
      }
      if (delIds.nonEmpty && compactThreshold > 0) {
        val total = math.max(1L,
          HnswRoutedPq.cellStats(index).map(_._2).sum)
        if (index.tombstones.length >= compactThreshold * total) {
          index = HnswRoutedPq.compactSolo(index, vectors,
            unpersistPrior = true, floatExact = floatExact)
          ops += 1
          // covering-probe the fresh compacted image off the serving
          // path (the post-fold cold tax; ledger-tracked)
          graft.BuildLedger.timed("routed_pq_warm_probe")(
            HnswRoutedPq.warmProbe(index))
          ()
        }
      }
      // overlay-depth fold (the StreamingRouted.cdcStep cadence):
      // bounds patch stacks a pre-patched handle brought in (e.g. from
      // remediateMergedCellsSolo's default); <= 0 disables, matching
      // the float tier's maxOverlayDepth contract
      if (maxOverlayDepth > 0 && index.overlay.length >= maxOverlayDepth) {
        index = HnswRoutedPq.foldOverlay(index)
        ops += 1
        graft.BuildLedger.timed("routed_pq_warm_probe")(
          HnswRoutedPq.warmProbe(index))
        ()
      }
      (index, ops)
    } finally { b.unpersist(); () }
  }

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
            // the [[StreamingRouted]] rebase-after-save discipline on
            // the two-tier handle: the float source rebases onto the
            // just-written image (keepVersions = 2 retains the version
            // a restart-attached float still reads across this save),
            // and the PQ tier re-roots via fromRoutedWith — a full
            // re-encode rather than the fingerprint-carry rederive, ON
            // PURPOSE: the carry path's zipPartitions keeps the OLD pq
            // shards (and through them the pre-rebase float chain) in
            // the new handle's lineage, which is exactly the reclaimed-
            // version recompute hazard this rebase exists to cut. One
            // narrow encode pass per save cadence, O(index) like the
            // save itself.
            HnswRouted.save(handle.float, path, keepVersions = 2)
            val priorF = handle.float
            val priorPq = handle.pq
            handle.float = HnswRouted.attach(batch.sparkSession, path)
            handle.pq = HnswRoutedPq.fromRoutedWith(handle.float,
              priorPq.codebook)
            priorF.unpersist()
            priorPq.unpersist()
            // probe both re-rooted tiers off the serving path
            graft.BuildLedger.timed("routed_warm_probe")(
              HnswRouted.warmProbe(handle.float))
            graft.BuildLedger.timed("routed_pq_warm_probe")(
              HnswRoutedPq.warmProbe(handle.pq))
            sinceSave = 0
            unsavedOps = 0
          }
        }
      }
      .start()
  }
}
