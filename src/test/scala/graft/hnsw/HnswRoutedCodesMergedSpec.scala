package graft.hnsw

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merged-cell detection + targeted remedy on the CODES tier — the
  * float tier's HnswRoutedMergedSpec re-planted in Hamming space: the
  * k-majority router merges well-separated code modes exactly like
  * k-means merges float clusters, and the 1e8-decade tier must detect
  * and remediate it the same way (the float tier measured an 11.6×
  * predicated-serving tax from one merged cell). */
class HnswRoutedCodesMergedSpec extends SparkSpec {
  import spark.implicits._

  private val params = HnswParams.standard(48, 96, 16)

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Two-level Hamming geometry that FORCES the merge at nCells = 2:
    * two far-apart super-codes (~32 bits, the structure two anchors
    * can see) each holding two sub-modes 16 bits apart (bits 0-7 vs
    * 8-15 flipped — the structure they cannot), members 2 noise-bit
    * flips from their mode. Cluster c owns ids [c*800, (c+1)*800);
    * super = c/2, sub = c%2. */
  private def clusterCode(i: Long): Long = {
    val c = (i / 800).toInt
    val superBase = mix(0x5151L + (c / 2))
    val mode = superBase ^ (0xFFL << ((c % 2) * 8))
    val n1 = (mix(i * 31L + 7L) & 63L).toInt
    val n2 = (mix(i * 57L + 11L) & 63L).toInt
    mode ^ (1L << n1) ^ (1L << n2)
  }
  private def planted() = {
    val baseDf = (0L until 3200L).map(i => (i, clusterCode(i))).toDF("id", "code")
    val index = HnswRoutedCodes.build(baseDf, params, nCells = 2,
      persist = false)
    (baseDf, index)
  }

  /** Exact Hamming top-k over the live rows — the driver-side oracle. */
  private def exactTopK(base: Seq[(Long, Long)], qs: Seq[(Long, Long)],
                        k: Int): Set[(Long, Long)] =
    qs.flatMap { case (qid, qc) =>
      base.map { case (id, c) =>
        (java.lang.Long.bitCount(qc ^ c), id)
      }.sorted.take(k).map { case (_, id) => (qid, id) }
    }.toSet

  test("audit flags exactly the cell holding a dead code mode beside a live one") {
    val (_, built) = planted()
    val index = HnswRoutedCodes.delete(built, (0L until 800L).toDF("id"))
    val audit = HnswRoutedCodes.mergedCellAudit(index, minCellRows = 100)
      .collect()
    val flagged = audit.filter(_.getBoolean(7)).map(_.getInt(0))
    assert(flagged.length == 1, audit.mkString("\n"))
    val row = audit.find(_.getInt(0) == flagged.head).get
    assert(row.getLong(2) == 800L, s"dead count ${row.getLong(2)}")
    assert(row.getLong(4) >= 8000L && row.getLong(5) <= 2000L,
      s"purity hi=${row.getLong(4)} lo=${row.getLong(5)}")
  }

  test("interleaved deletes are NOT flagged (no separability, no false positive)") {
    val (_, built) = planted()
    val index = HnswRoutedCodes.delete(built, (0L until 3200L by 2).toDF("id"))
    val audit = HnswRoutedCodes.mergedCellAudit(index, minCellRows = 100)
      .collect()
    assert(audit.nonEmpty, "cells inside the bimodal band must be audited")
    assert(!audit.exists(_.getBoolean(7)), audit.mkString("\n"))
  }

  test("remediate: targeted compact folds out only the flagged cell's dead ids; serving stays exact") {
    val (baseDf, built) = planted()
    val scattered = Seq(1601L, 2003L, 2407L, 3011L)
    val deleted = (0L until 800L) ++ scattered
    val index = HnswRoutedCodes.delete(built, deleted.toDF("id"))
    val (rem, flagged) = HnswRoutedCodes.remediateMergedCells(
      index, minCellRows = 100, persist = false, patched = false)
    assert(flagged.length == 1)
    assert(rem.tombstones.forall(scattered.contains))
    assert(!rem.tombstones.exists(_ < 800L))
    val qs = (0 until 40).map { q =>
      (q.toLong, clusterCode((q % 4) * 800L + 400 + q))
    }
    val served = HnswRoutedCodes.search(rem, qs.toDF("qid", "qcode"),
        10, nProbe = 2)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = (0L until 3200L).filter(i => i >= 800L && !scattered.contains(i))
      .map(i => (i, clusterCode(i)))
    assert(served == exactTopK(live, qs, 10))
  }

  test("patched compaction: row-identical to full-copy; base handle unaffected; fold releases the overlay") {
    val (_, built0) = planted()
    // patched needs a pinned partitioner — build persists one
    val baseDf = (0L until 3200L).map(i => (i, clusterCode(i))).toDF("id", "code")
    val built = HnswRoutedCodes.build(baseDf, params, nCells = 2)
    val deleted = (0L until 800L) ++ Seq(1601L, 2003L)
    val index = HnswRoutedCodes.delete(built, deleted.toDF("id"))
    val flagged = HnswRoutedCodes.mergedCellAudit(index, minCellRows = 100)
      .filter(col("merged")).select(col("cell")).collect().map(_.getInt(0))
    assert(flagged.nonEmpty)
    val qDf = (0 until 40).map { q =>
      (q.toLong, clusterCode((q % 4) * 800L + 400 + q))
    }.toDF("qid", "qcode")
    def rows(idx: HnswRoutedCodes.RoutedCodeIndex) =
      HnswRoutedCodes.search(idx, qDf, 10, nProbe = 2)
        .select(col("qid"), col("id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val preBase = rows(index)
    val full = HnswRoutedCodes.compactCells(index, flagged,
      persist = false, unpersistPrior = false)
    val patch = HnswRoutedCodes.compactCellsPatched(index, flagged,
      persist = true)
    assert(patch.tombstones.toSeq == full.tombstones.toSeq)
    assert(rows(patch) == rows(full))
    assert(patch.overlay.length == 1)
    assert(patch.shards.partitioner == index.shards.partitioner)
    assert(patch.shards.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
    assert(patch.overlay.head.getStorageLevel.useMemory)
    assert(rows(index) == preBase)
    val folded = HnswRoutedCodes.foldOverlay(patch)
    assert(folded.overlay.isEmpty)
    assert(rows(folded) == rows(full))
    folded.unpersist()
    built.unpersist()
    built0.unpersist()
  }

  test("no tombstones -> empty audit; compactCells on an empty list is the identity handle") {
    val (_, index) = planted()
    assert(HnswRoutedCodes.mergedCellAudit(index, minCellRows = 100)
      .count() == 0L)
    assert(HnswRoutedCodes.compactCells(index, Array.empty) eq index)
  }

  test("build-time modality guard: flagged cells split so a mode-aligned delete leaves whole cells dead") {
    val baseDf = (0L until 3200L).map(i => (i, clusterCode(i))).toDF("id", "code")
    val guarded = HnswRoutedCodes.build(baseDf, params, nCells = 2,
      persist = false, modalitySplit = true)
    // the guard split the two bimodal cells: ≥1 extra anchor landed
    assert(guarded.anchors.length > 2,
      s"expected split anchors, got ${guarded.anchors.length}")
    // each sub-mode now routes to its own cell: after wiping mode 0,
    // no cell sits in the bimodal band (its cell is ~all-dead, others
    // ~all-live) — the audit has nothing to flag
    val afterDelete = HnswRoutedCodes.delete(guarded, (0L until 800L).toDF("id"))
    val audit = HnswRoutedCodes.mergedCellAudit(afterDelete, minCellRows = 100)
      .collect()
    assert(!audit.exists(_.getBoolean(7)), audit.mkString("\n"))
    // serving is exact in the exhaustive regime over the survivors
    val qs = (0 until 40).map { q =>
      (q.toLong, clusterCode((q % 4) * 800L + 400 + q))
    }
    val served = HnswRoutedCodes.search(afterDelete,
        qs.toDF("qid", "qcode"), 10, nProbe = guarded.anchors.length)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = (800L until 3200L).map(i => (i, clusterCode(i)))
    assert(served == exactTopK(live, qs, 10))
  }
}
