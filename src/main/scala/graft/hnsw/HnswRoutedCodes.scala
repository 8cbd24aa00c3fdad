package graft.hnsw

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{EntryPoint, GraphSnapshot, InMemoryGraph, LayerCsr}

/** IVF-routed sharded HNSW over u64 bit-codes under Hamming distance —
  * [[HnswRouted]]'s architecture applied to the reference's NATIVE
  * representation (lazy_memory_store.rs:14-21, 49-54): a coarse
  * quantizer routes codes into cells, each cell holds its own HNSW
  * graph of codes, a query probes its nProbe nearest cells.
  *
  * The router is a K-MAJORITY quantizer (binary k-means: assignment by
  * Hamming distance to anchor codes, update by per-bit majority vote —
  * the Hamming-space analog of Lloyd's centroid mean, deterministic
  * seeded anchors + fixed iterations). 8 bytes per vector means this
  * tier has no Kryo 2 GiB envelope anywhere near practical scale: at
  * 1e8 codes the whole corpus is 800 MB spread across cells — the rung
  * the float tier's broadcast build refuses is this tier's natural
  * decade (measured in BASELINE.md).
  *
  * Same disciplines as the float tier: global id dedup before routing,
  * cell histogram fail-fast (codes that coincide can no more be split
  * than duplicate vectors — the guard names the dials), keyed shards
  * on a pinned partitioner, per-cell sequential construction in
  * ascending id order. The exhaustive regime (nProbe = nCells) is held
  * to the same full hash oracle as the flat Hamming index
  * (`h_knn_routed_hamming`).
  *
  * Production story mirrors [[HnswRouted]]: [[save]]/[[attach]]
  * persist a versioned parquet image (meta/anchors/codes/links/
  * entries) restored by one co-partitioned cogroup — no k-majority
  * training, no graph construction; [[ingest]] merges a batch per
  * cell with a narrow dependency on the index side and a global
  * duplicate-id fail-fast. */
object HnswRoutedCodes {

  final case class CodeCellShard(
      cell: Int,
      codes: LongLongMap,
      snapshot: GraphSnapshot) extends Serializable

  /** `tombstones` is the index's deletion set (sorted ids) — the float
    * tier's soft-delete contract ([[HnswRouted.RoutedIndex]]):
    * [[delete]] adds, [[search]] excludes, [[compact]] folds out per
    * affected cell and frees the ids for re-[[ingest]]. */
  final case class RoutedCodeIndex(
      params: HnswParams,
      seed: Long,
      anchors: Array[Long],
      shards: org.apache.spark.rdd.RDD[(Int, CodeCellShard)],
      tombstones: Array[Long] = Array.empty,
      overlay: Seq[org.apache.spark.rdd.RDD[_]] = Nil) {
    def unpersist(): Unit = {
      overlay.foreach(_.unpersist())
      shards.unpersist()
    }
  }

  private val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  /** The u64-code tier's [[RoutedTier]] binding — one shared lifecycle
    * ([[RoutedLifecycle]]) across the three serving tiers; only the
    * representation (LongLongMap members, Hamming-space rebuild) lives
    * here. `unpersistBlocking`: this is the DISK_ONLY-decade tier —
    * the superseded image is ~the index's full footprint, reclaim it
    * before the caller's next job rather than racing the async
    * cleaner. */
  private[graft] object CodeTier extends RoutedTier[CodeCellShard, RoutedCodeIndex] {
    def shards(i: RoutedCodeIndex): org.apache.spark.rdd.RDD[(Int, CodeCellShard)] = i.shards
    def tombstones(i: RoutedCodeIndex): Array[Long] = i.tombstones
    def overlays(i: RoutedCodeIndex): Seq[org.apache.spark.rdd.RDD[_]] = i.overlay
    def make(i: RoutedCodeIndex, shards: org.apache.spark.rdd.RDD[(Int, CodeCellShard)],
             tombstones: Array[Long],
             overlays: Seq[org.apache.spark.rdd.RDD[_]]): RoutedCodeIndex =
      RoutedCodeIndex(i.params, i.seed, i.anchors, shards, tombstones, overlays)
    val cacheName = "graft-hnsw-routed-codes"
    val tierName = "routed-codes"
    val unpersistBlocking = true
    val resurrectHint = "Run compact() first (frees the ids), or route " +
      "through the CDC stream, which filters tombstoned inserts"
    def memberCount(s: CodeCellShard): Int = s.codes.size
    def containsId(s: CodeCellShard, id: Long): Boolean = s.codes.contains(id)
    def idIterator(s: CodeCellShard): Iterator[Long] = s.codes.keysIterator
    def survivorRebuild(i: RoutedCodeIndex): (Int, CodeCellShard, Array[Long]) => CodeCellShard = {
      val params = i.params
      val seed = i.seed
      (cell, s, dead) => {
        val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        s.codes.foreach { (id, c) =>
          if (java.util.Arrays.binarySearch(dead, id) < 0) rows += ((id, c))
        }
        buildCellFresh(cell, rows.toArray.sortBy(_._1), params, seed)
      }
    }
  }

  @inline private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Nearest anchor by Hamming distance; ties to the lowest index (the
    * deterministic contract every assignment site shares). */
  def nearestAnchor(code: Long, anchors: Array[Long]): Int = {
    var best = 0; var bestD = Int.MaxValue
    var i = 0
    while (i < anchors.length) {
      val d = hamming(code, anchors(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** K-majority training on a deterministic driver sample (the
    * Ivf.train discipline: hash-stride selection — order-independent —
    * then id-sorted take). Anchor update = per-bit majority over the
    * cell's members; an empty cell keeps its anchor. */
  def trainAnchors(codes: DataFrame, nCells: Int, seed: Long = 11L,
                   iters: Int = 10, maxSample: Int = 100000): Array[Long] = {
    val total = codes.count()
    val stride = math.max(1L,
      (total + math.max(1, maxSample) - 1) / math.max(1, maxSample))
    val sample = codes
      .filter(pmod(xxhash64(col("id"), lit(seed)), lit(stride)) === 0L)
      .select(col("id"), col("code")).as(pairEnc)
      .collect().sortBy(_._1).take(maxSample).map(_._2)
    require(sample.nonEmpty, "empty training set")

    // initial anchors must be DISTINCT codes: nearestAnchor ties to the
    // lowest index, so a duplicated anchor's cell can never receive a
    // member, never updates, and stays dead — silently shrinking the
    // effective nCells and inflating survivors toward maxCellRows.
    // Hash-pick a start slot per anchor, then linear-probe forward to
    // the next code not yet chosen (identical to the old selection
    // whenever the hash pick was already distinct); stop early if the
    // sample holds fewer distinct codes than nCells.
    var anchors = {
      val chosen = new LongSet(nCells * 2)
      val init = Array.newBuilder[Long]
      var i = 0
      var exhausted = false
      while (i < math.min(nCells, sample.length) && !exhausted) {
        val start =
          ((HnswSearcher.uniformFromHash(i.toLong, seed) * sample.length).toInt)
            .min(sample.length - 1)
        var off = 0
        var picked = false
        while (!picked && off < sample.length) {
          val c = sample((start + off) % sample.length)
          if (chosen.add(c)) { init += c; picked = true }
          off += 1
        }
        exhausted = !picked
        i += 1
      }
      init.result()
    }
    var it = 0
    while (it < iters) {
      val ones = Array.ofDim[Int](anchors.length, 64)
      val counts = new Array[Int](anchors.length)
      sample.foreach { c =>
        val a = nearestAnchor(c, anchors)
        counts(a) += 1
        var b = 0
        while (b < 64) { if (((c >>> b) & 1L) == 1L) ones(a)(b) += 1; b += 1 }
      }
      anchors = anchors.zipWithIndex.map { case (old, a) =>
        if (counts(a) == 0) old
        else {
          var out = 0L
          var b = 0
          // strict majority sets the bit; exact ties clear it — any
          // deterministic rule works, this one is the simplest
          while (b < 64) {
            if (2 * ones(a)(b) > counts(a)) out |= (1L << b)
            b += 1
          }
          out
        }
      }
      it += 1
    }
    anchors
  }

  /** Fresh per-cell construction from id-sorted (id, code) rows —
    * shared by [[build]] and [[compact]] so a compacted cell is
    * graph-identical to a fresh build of its surviving rows (same
    * insert order, same layer draws). */
  private def buildCellFresh(cell: Int, rows: Array[(Long, Long)],
                             params: HnswParams, seed: Long): CodeCellShard = {
    val store = new CellCodeStore(
      LongLongMap.from(rows.iterator, math.max(8, rows.length)))
    val graph = new InMemoryGraph
    val searcher = new HnswSearcher(params)
    rows.foreach { case (id, _) =>
      searcher.insert(store, graph, id, searcher.selectLayerByHash(id, seed))
    }
    CodeCellShard(cell, store.codes, graph.snapshot)
  }

  /** Per-cell row budget (see [[HnswRouted.DefaultMaxCellRows]]): codes
    * are 8 B/row, so the budget here bounds GRAPH memory (edges), not
    * vector memory — the same 4M default keeps a cell's layer-0 arrays
    * ~1 GiB at mMax=32. */
  val DefaultMaxCellRows = 4000000L

  /** Default shard residency. DISK_ONLY is the LOCAL-mode lever for
    * indexes larger than the heap's storage fraction (a 1e8-code index
    * is ~30 GB of CSR graphs): shards stream to disk as they build and
    * deserialize per probed partition at search — on a cluster the
    * same bytes spread across executors and MEMORY_AND_DISK is right. */
  val DefaultStorage: org.apache.spark.storage.StorageLevel =
    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** `modalitySplit`: opt-in BUILD-TIME modality guard — the float
    * tier's [[HnswRouted.build]] flag on the code representation. The
    * k-majority router routinely packs several well-separated code
    * modes into one cell (the skew guard bounds SIZE, not modality);
    * with the flag on, every cell above a row floor runs the sampled
    * [[modalCensusCodes]] separability census, and flagged cells'
    * strong-mode majority codes become ADDITIONAL anchors (the
    * strongest mode replaces the merged anchor) before the final
    * assignment — so a later delete aligned with one mode leaves whole
    * CELLS dead, which predicated serving skips outright, instead of
    * half-dead cells it must exact-scan. Off by default: the guard
    * adds one assignment pass + one bounded sampled collect. */
  def build(codes: DataFrame, params: HnswParams = HnswParams.standard(64, 32, 32),
            nCells: Int = 16, seed: Long = 42L, persist: Boolean = true,
            maxCellRows: Long = DefaultMaxCellRows,
            storage: org.apache.spark.storage.StorageLevel = DefaultStorage,
            modalitySplit: Boolean = false): RoutedCodeIndex = {
    val spark = codes.sparkSession
    // global id dedup (deterministic survivor: max code)
    val deduped = codes.select(col("id"), col("code"))
      .groupBy(col("id")).agg(max(col("code")).as("code"))
    val anchors0 = trainAnchors(deduped, nCells, seed)
    val anchors =
      if (!modalitySplit) anchors0
      else {
        val aB = spark.sparkContext.broadcast(anchors0)
        val keyed0 = deduped.select(col("id"), col("code")).as(pairEnc).rdd
          .map { case (id, c) => (nearestAnchor(c, aB.value), (id, c)) }
        val hist0 = keyed0.mapValues(_ => 1L).reduceByKey(_ + _).collect()
        val audit = hist0.filter(_._2 >= ModalityMinCellRows)
        if (audit.isEmpty) anchors0
        else {
          // one decimated collect serves ALL audited cells; per-cell
          // sample bounded by ModalitySampleMax, decimated by id hash
          // (the float guard's discipline — never by position)
          val keepB = spark.sparkContext.broadcast(audit.map {
            case (cell, cn) =>
              cell -> math.min(1.0, ModalitySampleMax.toDouble / cn)
          }.toMap)
          val sampled = keyed0.flatMap { case (cell, (id, c)) =>
            keepB.value.get(cell) match {
              case Some(keep)
                if HnswSearcher.uniformFromHash(id, seed ^ 0x9E3779B9L) < keep =>
                Iterator.single((cell, id, c))
              case _ => Iterator.empty
            }
          }.collect()
          val flagged = sampled.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
            case (cell, rows) =>
              val cs = rows.sortBy(_._2).take(ModalitySampleMax).map(_._3)
              val groups = modalCensusCodes(cs)
              if (groups.length >= 2) Some(cell -> groups) else None
          }
          if (flagged.isEmpty) anchors0
          else {
            // the census's group majority codes ARE the extra anchors
            // (children align with the detected modes by construction;
            // nearestAnchor is global, so the final assignment below
            // re-routes every row against the extended set). Anchors
            // must stay DISTINCT — ties go to the lowest index, so a
            // duplicate anchor's cell would be dead: skip mode codes
            // already present.
            // presence is a live COUNT over the evolving anchor list,
            // not a grow-only set: k-majority training can converge an
            // anchor EXACTLY onto one mode's code (measured at the 1e6
            // rung — anchor 14 WAS mode 0's code), and with a grow-only
            // set the head replacement evicted that code from the list
            // while "already present" then swallowed its re-append —
            // the one cell that stayed merged after the guard ran
            val out = scala.collection.mutable.ArrayBuffer.from(anchors0)
            val count = scala.collection.mutable.Map.empty[Long, Int]
            out.foreach(a => count(a) = count.getOrElse(a, 0) + 1)
            flagged.foreach { case (cell, groups) =>
              val head = groups.head._1
              if (head != out(cell) && count.getOrElse(head, 0) == 0) {
                count(out(cell)) = count(out(cell)) - 1 // slot vacates
                count(head) = 1
                out(cell) = head
              }
              groups.iterator.drop(1).foreach { case (g, _) =>
                if (count.getOrElse(g, 0) == 0) { count(g) = 1; out += g }
              }
            }
            out.toArray
          }
        }
      }
    val anchorsB = spark.sparkContext.broadcast(anchors)
    val keyedRaw = deduped.select(col("id"), col("code")).as(pairEnc).rdd
      .map { case (id, c) => (nearestAnchor(c, anchorsB.value), (id, c)) }

    // skew guard: histogram fail-fast. Coincident codes cannot be
    // separated by ANY Hamming quantizer (they are the same point), so
    // unlike the float tier there is no secondary-split escape for true
    // mass collapse — fail at entry, naming the dials.
    val hist = keyedRaw.mapValues(_ => 1L).reduceByKey(_ + _).collect()
    val over = hist.filter(_._2 > maxCellRows)
    require(over.isEmpty,
      s"HnswRoutedCodes.build: ${over.length} cell(s) exceed " +
        s"maxCellRows=$maxCellRows (largest: ${over.map(_._2).max} rows). " +
        "Dials: raise nCells (more anchors), raise maxCellRows (more " +
        "executor memory per cell), or use HnswCodes.buildBatched (the " +
        "single-graph micro-batched tier) for collapsed code mass")

    val part = new HashPartitioner(math.max(1, anchors.length))
    val shards = keyedRaw.partitionBy(part).mapPartitions({ it =>
      val byCell = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
      it.foreach { case (cell, row) =>
        byCell.getOrElseUpdate(cell,
          scala.collection.mutable.ArrayBuffer.empty) += row
      }
      byCell.iterator.map { case (cell, buf) =>
        cell -> buildCellFresh(cell, buf.toArray.sortBy(_._1), params, seed)
      }
    }, preservesPartitioning = true)
    if (persist) {
      shards.persist(storage).setName("graft-hnsw-routed-codes")
      shards.count()
    }
    RoutedCodeIndex(params, seed, anchors, shards)
  }

  /** Incremental ingest — [[HnswRouted.ingest]]'s contract on the code
    * representation: route the batch by nearest anchor, merge PER CELL
    * into the live graphs (untouched cells pass through by reference;
    * a cell with no prior shard starts fresh). The index side has a
    * NARROW dependency on its pinned partitioner — only the batch
    * shuffles, never the corpus. Ids must be new to the INDEX: a
    * global broadcast guard fails fast naming the cell that already
    * holds a clashing id (the cross-cell double-registration hazard —
    * a redelivered id whose code drifted routes to a different cell).
    * The ANCHORS ARE FROZEN; drift recovery is retrain + rebuild. */
  def ingest(index: RoutedCodeIndex, newRows: DataFrame,
             persist: Boolean = true,
             storage: org.apache.spark.storage.StorageLevel = DefaultStorage): RoutedCodeIndex = {
    val spark = newRows.sparkSession
    val params = index.params
    val seed = index.seed
    val deduped = newRows.select(col("id"), col("code"))
      .groupBy(col("id")).agg(max(col("code")).as("code"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchIds = deduped.select(col("id"))
        .as(Encoders.scalaLong).collect()
      java.util.Arrays.sort(batchIds)
      // shared fail-fast guards (RoutedLifecycle): tombstoned-id
      // resurrect + cross-cell duplicate-id scan
      RoutedLifecycle.guardResurrect(CodeTier)(index, batchIds)
      RoutedLifecycle.guardClashes(CodeTier)(index, batchIds)

      val anchorsB = spark.sparkContext.broadcast(index.anchors)
      val part = index.shards.partitioner.getOrElse(
        new HashPartitioner(math.max(1, index.anchors.length)))
      val keyed = deduped.select(col("id"), col("code")).as(pairEnc).rdd
        .map { case (id, c) => (nearestAnchor(c, anchorsB.value), (id, c)) }
        .partitionBy(part)
      val merged = index.shards.cogroup(keyed).mapPartitions({ it =>
        it.flatMap { case (cell, (shards, rows)) =>
          if (rows.isEmpty) shards.iterator.map(s => cell -> s)
          else {
            val sorted = rows.toArray.sortBy(_._1)
            // copy-on-merge: the prior shard may still be cached (and
            // may be recomputed) — never mutate it in place
            val (codeMap, graph) = shards.headOption match {
              case Some(prior) =>
                (prior.codes.copy(extra = sorted.length),
                  InMemoryGraph.fromSnapshot(prior.snapshot))
              case None =>
                (new LongLongMap(sorted.length), new InMemoryGraph)
            }
            sorted.foreach { case (id, c) => codeMap.put(id, c) }
            val store = new CellCodeStore(codeMap)
            val searcher = new HnswSearcher(params)
            sorted.foreach { case (id, _) =>
              searcher.insert(store, graph, id,
                searcher.selectLayerByHash(id, seed))
            }
            Iterator.single(cell -> CodeCellShard(cell, codeMap, graph.snapshot))
          }
        }
      }, preservesPartitioning = true)
      if (persist) {
        merged.persist(storage).setName("graft-hnsw-routed-codes")
        merged.count()
        // blocking: at DISK_ONLY scale the superseded index is ~the
        // index's full footprint — reclaim it before the caller's next
        // job rather than racing the async cleaner
        index.shards.unpersist(blocking = true)
        index.overlay.foreach(_.unpersist())
      }
      // the deletion set survives ingest (see HnswRouted.ingest);
      // overlays stay tracked unless just released
      RoutedCodeIndex(params, seed, index.anchors, merged, index.tombstones,
        overlay = if (persist) Nil else index.overlay)
    } finally deduped.unpersist(blocking = false)
  }

  /** Opt-in serving warm-up — [[HnswRouted.warm]] on the code
    * representation (this tier runs the DISK_ONLY decades where the
    * cold-first-serve tax is largest). One deserializing sweep off
    * the serving path; returns the shard count. */
  def warm(index: RoutedCodeIndex): Long = RoutedOps.warm(index.shards)

  /** Covering-probe warm-up — [[HnswRouted.warmProbe]] on the code
    * representation: one member code per cell served back through the
    * full path at k = 1, paying the kernel JIT + plan warm-up that
    * [[warm]]'s block sweep leaves on the first real serve. */
  def warmProbe(index: RoutedCodeIndex, ef: Int = 16): Long = {
    val reps = index.shards.flatMap { case (cell, s) =>
      // headOption stops at the first occupied slot — the probe-rep
      // collection is O(nCells), not O(index)
      s.codes.headOption.iterator.map { case (_, c) => (cell.toLong, c) }
    }.collect()
    if (reps.isEmpty) 0L
    else {
      val spark = SparkSession.active
      import spark.implicits._
      val qDf = reps.toSeq.toDF("qid", "qcode")
      search(index, qDf, k = 1, nProbe = 1, ef0 = ef).count()
      reps.length.toLong
    }
  }

  /** Drift recovery — [[HnswRouted.retrain]] on the code
    * representation: re-train the k-majority anchors on the index's
    * current corpus and rebuild from its own shards (tombstones fold
    * out; cells rebalance; `nCells = 0` keeps the current count). */
  def retrain(index: RoutedCodeIndex, nCells: Int = 0,
              persist: Boolean = true,
              maxCellRows: Long = DefaultMaxCellRows,
              storage: org.apache.spark.storage.StorageLevel = DefaultStorage): RoutedCodeIndex = {
    val spark = SparkSession.active
    val n = if (nCells > 0) nCells else index.anchors.length
    val tombB = index.shards.sparkContext.broadcast(index.tombstones)
    val rows = index.shards.flatMap { case (_, s) =>
      val dead = tombB.value
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      s.codes.foreach { (id, c) =>
        if (dead.length == 0 || java.util.Arrays.binarySearch(dead, id) < 0)
          out += ((id, c))
      }
      out.iterator
    }
    val df = spark.createDataset(rows)(pairEnc).toDF("id", "code")
    build(df, index.params, n, index.seed, persist, maxCellRows, storage)
  }

  /** Which of `ids` (sorted ascending) are present in the index — the
    * float tier's [[HnswRouted.presentIds]] on the code representation
    * (one narrow broadcast scan; CDC idempotence). */
  def presentIds(index: RoutedCodeIndex, ids: Array[Long]): Array[Long] =
    RoutedOps.presentIds(index.shards, ids)(
      (s, f) => s.codes.foreach((id, _) => f(id)))

  /** Tombstone delete-without-rebuild — [[HnswRouted.delete]]'s
    * contract on the code representation: O(set) handle metadata, the
    * shards are SHARED with the input handle. [[search]] excludes the
    * set transparently (tombstoned vertices still conduct the in-cell
    * traversal); [[compact]] folds it out and frees the ids. */
  def delete(index: RoutedCodeIndex, ids: DataFrame): RoutedCodeIndex =
    RoutedLifecycle.delete(CodeTier)(index, ids)

  /** Fold the deletion set out of the graphs — [[HnswRouted.compact]]:
    * ONLY cells holding a tombstoned id rebuild (fresh, via
    * [[buildCellFresh]] — graph-identical to a fresh build of the
    * survivors); untouched cells pass through by reference. Returns an
    * index with an empty deletion set; compacted-away ids can
    * re-[[ingest]]. */
  def compact(index: RoutedCodeIndex, persist: Boolean = true,
              unpersistPrior: Boolean = true,
              storage: org.apache.spark.storage.StorageLevel = DefaultStorage): RoutedCodeIndex =
    RoutedLifecycle.compact(CodeTier)(index, persist, unpersistPrior, storage)

  /** PATCHED compaction — [[HnswRouted.compactCellsPatched]] on the
    * codes tier, with the touched set derived from the deletion set
    * itself (one narrow membership pass): only the rebuilt cells
    * persist (an overlay whose untouched partitions are empty blocks);
    * the served `shards` is an unpersisted partitioner-preserving
    * composite reading the base's cached blocks everywhere else. The
    * regime where this pays is a MEMORY-RESIDENT base (the cluster
    * posture): measured 0.99-1.01× plain serving with a cheaper fold
    * at 4e5-1e7. The honest 1e8 DISK_ONLY result (BASELINE round-15):
    * the fold costs the same ~840 s as the full copy (the one full
    * deserialize pass dominates, not the write churn) and the
    * composite's serving read 128 s vs 2.6 s on the warm base while
    * staying exactly correct — at the local disk decade prefer the
    * full-copy [[compact]]; the composite tax there is an open
    * round-16 diagnosis. The base index must STAY cached; fold the
    * patch stack back to one full image with [[foldOverlay]] on a
    * cadence. */
  def compactPatched(index: RoutedCodeIndex,
                     persist: Boolean = true): RoutedCodeIndex =
    RoutedLifecycle.compactPatched(CodeTier)(index, persist)

  /** Materialize a patched index back into ONE persisted full image and
    * release the overlay stack (see [[HnswRouted.foldOverlay]]). */
  def foldOverlay(index: RoutedCodeIndex,
                  storage: org.apache.spark.storage.StorageLevel = DefaultStorage): RoutedCodeIndex =
    RoutedLifecycle.foldOverlay(CodeTier)(index, storage)

  // --------------------------------------------------------------------
  // Merged-cell detection + targeted remedy — [[HnswRouted
  // .mergedCellAudit]]'s machinery on the Hamming representation. The
  // k-majority router can merge well-separated code modes into one cell
  // exactly like k-means merges float clusters (the float tier measured
  // an 11.6× predicated-serving tax from ONE merged cell before the
  // remedy landed there), and THIS tier is the 1e8-decade tier — the
  // scale where that failure class costs the most.
  // --------------------------------------------------------------------

  private val ModalityMinCellRows = 256L
  private val ModalitySampleMax = 1024
  private val ModalityShareBp = 1500L
  private val ModalitySepFactor = 3.0
  private val ModalityKSplit = 8
  private val ModalityIters = 8

  /** Per-bit strict-majority code over `rows` restricted to indices
    * where `in(i)` — the Hamming analog of the float tier's component
    * mean (strict majority sets the bit; exact ties clear it — the
    * [[trainAnchors]] update rule, any deterministic rule works). Zero
    * participants yield 0L. */
  private def majorityWhere(rows: Array[(Long, Long)],
                            in: Int => Boolean): Long = {
    val ones = new Array[Int](64); var n = 0
    var i = 0
    while (i < rows.length) {
      if (in(i)) {
        val c = rows(i)._2
        var b = 0
        while (b < 64) { if (((c >>> b) & 1L) == 1L) ones(b) += 1; b += 1 }
        n += 1
      }
      i += 1
    }
    if (n == 0) 0L
    else {
      var out = 0L; var b = 0
      while (b < 64) { if (2 * ones(b) > n) out |= (1L << b); b += 1 }
      out
    }
  }

  /** Modal census of a cell's code sample — [[HnswRouted.modalCensus]]
    * on Hamming space: deterministic k-majority (whole-sample majority
    * + farthest-point seeds), components single-linkage-merged at
    * [[ModalitySepFactor]] × the mass-weighted mean component radius
    * (mean Hamming to the component's majority code — Hamming is
    * already linear, no sqrt pass), strong-share test on the MERGED
    * groups. Returns the strong groups as (group majority code, sample
    * count), descending by count; 0-1 groups = unimodal. */
  private[graft] def modalCensusCodes(codes: Array[Long]): Array[(Long, Int)] = {
    if (codes.length < 32) return Array.empty
    val rows = codes.map(c => (0L, c)) // (unused id, code) for majorityWhere
    val n = codes.length
    val k = math.max(2, math.min(ModalityKSplit, n / 4))
    val cents = new Array[Long](k)
    cents(0) = majorityWhere(rows, _ => true)
    var j = 1
    while (j < k) {
      var best = 0L; var bestD = -1
      var i = 0
      while (i < n) {
        var minD = Int.MaxValue; var c = 0
        while (c < j) {
          val d = hamming(codes(i), cents(c)); if (d < minD) minD = d; c += 1 }
        if (minD > bestD) { bestD = minD; best = codes(i) }
        i += 1
      }
      cents(j) = best; j += 1
    }
    @inline def nearest(code: Long): Int = {
      var bi = 0; var bd = Int.MaxValue; var c = 0
      while (c < k) {
        val d = hamming(code, cents(c)); if (d < bd) { bd = d; bi = c }; c += 1 }
      bi
    }
    var it = 0
    while (it < ModalityIters) {
      val assign = new Array[Int](n)
      var i = 0
      while (i < n) { assign(i) = nearest(codes(i)); i += 1 }
      var c = 0
      while (c < k) {
        val cc = c
        var any = false
        i = 0
        while (i < n && !any) { if (assign(i) == cc) any = true; i += 1 }
        if (any) cents(c) = majorityWhere(rows, idx => assign(idx) == cc)
        c += 1 // an empty component keeps its code
      }
      it += 1
    }
    val assign = new Array[Int](n)
    val ns = new Array[Int](k); val sumD = new Array[Double](k)
    var i = 0
    while (i < n) {
      val c = nearest(codes(i)); assign(i) = c
      ns(c) += 1; sumD(c) += hamming(codes(i), cents(c))
      i += 1
    }
    val parts = (0 until k).filter(c => ns(c) >= 8).toArray
    if (parts.length == 0) return Array.empty
    // ROBUST mean radius (round-16 fix, measured at the 1e6 rung): a
    // Lloyd component that STRADDLES two modes (unlucky farthest-point
    // seeding) reads radius ~ the inter-mode distance/2; mass-weighted
    // into the mean it inflates the linkage threshold past the
    // inter-mode distance itself, the modes merge into one group, and
    // the cell silently reads unimodal — exactly one of 16 planted
    // bimodal cells escaped the guard this way. Straddlers are rare
    // among k=8 components, so the MEDIAN radius resists them: exclude
    // components beyond 2x the median from the threshold computation
    // (they still participate in the linkage itself — their own group
    // assignment is decided by their center like everyone else's).
    // Tiny outlier fragments must still not DRAG the mean down, so the
    // kept components combine mass-weighted (the original rationale).
    val radii = parts.map(c => sumD(c) / ns(c))
    val medianRad = radii.sorted.apply(radii.length / 2)
    val kept = parts.indices.filter(i =>
      medianRad == 0.0 || radii(i) <= 2.0 * medianRad)
    val meanRad = kept.map(i => ns(parts(i)) * radii(i)).sum /
      math.max(1L, kept.map(i => ns(parts(i)).toLong).sum)
    val parent = Array.tabulate(parts.length)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    if (meanRad > 0.0)
      for (a <- parts.indices; b <- (a + 1) until parts.length) {
        val d = hamming(cents(parts(a)), cents(parts(b))).toDouble
        if (d < ModalitySepFactor * meanRad) {
          val (x, y) = (find(a), find(b)); if (x != y) parent(x) = y
        }
      }
    val minShare = math.max(8L, n * ModalityShareBp / 10000L)
    parts.indices.groupBy(find).values.toArray
      .map { idxs =>
        val members = idxs.map(parts(_)).toSet
        val total = idxs.map(x => ns(parts(x))).sum
        val code = majorityWhere(rows, x => members.contains(assign(x)))
        (code, total)
      }
      .filter(_._2 >= minShare)
      .sortBy(-_._2)
  }

  /** Merged-cell audit — [[HnswRouted.mergedCellAudit]] on the code
    * representation, for the regime the per-cell density census cannot
    * see: the k-majority router packed a now-DEAD code mode and a live
    * mode into one cell, so the cell reads ~50% eligible cell-wide
    * while queries arriving on the dead side have ~zero eligible among
    * their nearest — predicated serving there pays the exact scan
    * every probe. One narrow pass, no shuffle: cells whose dead
    * fraction is bimodal-eligible run a deterministic k-majority split
    * whose first two seeds are the dead-member and live-member
    * majority codes (hypothesis-shaped init; k > 2 catches cells that
    * merged SEVERAL modes), then a full-member purity census per
    * component — flagged `merged` when ≥80%-pure-dead components hold
    * ≥80% of the dead mass beside a clearly-live component. Schema and
    * thresholds identical to the float audit. Remedy:
    * [[compactCells]]/[[compactCellsPatched]] on the flagged ids. */
  def mergedCellAudit(index: RoutedCodeIndex, minCellRows: Int = 1024,
                      minDeadBp: Int = 1000, maxDeadBp: Int = 9000,
                      sampleMax: Int = 4096, iters: Int = 8,
                      kSplit: Int = 8): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val tombB = index.shards.sparkContext.broadcast(index.tombstones)
    val rows = index.shards.flatMap { case (cell, s) =>
      val dead = tombB.value
      val cellN = s.codes.size
      if (dead.length == 0 || cellN < minCellRows) Iterator.empty
      else {
        @inline def isDead(id: Long): Boolean =
          java.util.Arrays.binarySearch(dead, id) >= 0
        var nDead = 0
        s.codes.foreach { (id, _) => if (isDead(id)) nDead += 1 }
        val deadBp = nDead * 10000L / cellN
        if (deadBp < minDeadBp || deadBp > maxDeadBp) Iterator.empty
        else {
          // deterministic sample, decimated by ID HASH (never by
          // position — see the float audit's aliasing note); falls
          // back to the full cell if the sample misses a class
          val all = s.codes.toSeq.toArray.sortBy(_._1)
          val keep = math.min(1.0, sampleMax.toDouble / all.length)
          val hashed = all.filter { case (id, _) =>
            HnswSearcher.uniformFromHash(id, 0x9E3779B9L) < keep }
          val sample =
            if (hashed.length >= 32 && hashed.exists(r => isDead(r._1)) &&
                hashed.exists(r => !isDead(r._1))) hashed
            else all
          val sn = sample.length
          val k = math.max(2, math.min(kSplit, sn / 4))
          val cents = new Array[Long](k)
          cents(0) = majorityWhere(sample, i => isDead(sample(i)._1))
          cents(1) = majorityWhere(sample, i => !isDead(sample(i)._1))
          // farthest-point seeds (deterministic): extra components
          // catch structure the two hypothesis seeds cannot hold when
          // >2 modes share the cell (the float audit's k>2 rationale)
          var j = 2
          while (j < k) {
            var best = 0L; var bestD = -1
            var i = 0
            while (i < sn) {
              var minD = Int.MaxValue; var c = 0
              while (c < j) {
                val d = hamming(sample(i)._2, cents(c))
                if (d < minD) minD = d
                c += 1
              }
              if (minD > bestD) { bestD = minD; best = sample(i)._2 }
              i += 1
            }
            cents(j) = best; j += 1
          }
          @inline def nearest(code: Long): Int = {
            var bi = 0; var bd = Int.MaxValue; var c = 0
            while (c < k) {
              val d = hamming(code, cents(c))
              if (d < bd) { bd = d; bi = c }
              c += 1
            }
            bi
          }
          var it = 0
          while (it < iters) {
            val assign = new Array[Int](sn)
            var i = 0
            while (i < sn) { assign(i) = nearest(sample(i)._2); i += 1 }
            var c = 0
            while (c < k) {
              val cc = c
              var any = false
              i = 0
              while (i < sn && !any) { if (assign(i) == cc) any = true; i += 1 }
              if (any) cents(c) = majorityWhere(sample, x => assign(x) == cc)
              c += 1 // an empty component keeps its code
            }
            it += 1
          }
          // census EVERY member (not just the sample) per component
          val compN = new Array[Long](k); val compDead = new Array[Long](k)
          s.codes.foreach { (id, code) =>
            val c = nearest(code)
            compN(c) += 1; if (isDead(id)) compDead(c) += 1
          }
          var hiBp = 0L; var loBp = 10000L; var pureDeadMass = 0L
          var c = 0
          while (c < k) {
            if (compN(c) > 0) {
              val bp = compDead(c) * 10000L / compN(c)
              if (bp > hiBp) hiBp = bp
              if (bp < loBp) loBp = bp
              if (bp >= 8000L) pureDeadMass += compDead(c)
            }
            c += 1
          }
          val massHiBp = if (nDead == 0) 0L else pureDeadMass * 10000L / nDead
          val merged = hiBp >= 8000L && loBp <= 2000L && massHiBp >= 8000L
          Iterator.single((cell, cellN.toLong, nDead.toLong, deadBp,
            hiBp, loBp, massHiBp, merged))
        }
      }
    }.collect()
    rows.toSeq.toDF("cell", "n", "n_dead", "dead_bp",
      "hi_dead_bp", "lo_dead_bp", "dead_mass_hi_bp", "merged")
  }

  /** Targeted compaction — [[HnswRouted.compactCells]] on the code
    * representation: fold the deletion set out of ONLY the listed
    * cells (narrow map, untouched cells pass by reference) and SHRINK
    * the tombstone set by exactly the ids that lived there. */
  def compactCells(index: RoutedCodeIndex, cells: Array[Int],
                   persist: Boolean = true,
                   unpersistPrior: Boolean = true,
                   storage: org.apache.spark.storage.StorageLevel = DefaultStorage): RoutedCodeIndex =
    RoutedLifecycle.compactCells(CodeTier)(index, cells, persist,
      unpersistPrior, storage)

  /** [[compactCells]] with O(touched) persisted bytes — the float
    * tier's [[HnswRouted.compactCellsPatched]] overlay discipline on
    * the code representation (only the rebuilt cells persist; the
    * served composite reads the base's cached blocks everywhere else;
    * the base handle must stay cached and keeps serving its own
    * answer; patches stack, [[foldOverlay]] bounds the stack). */
  def compactCellsPatched(index: RoutedCodeIndex, cells: Array[Int],
                          persist: Boolean = true): RoutedCodeIndex =
    RoutedLifecycle.compactCellsPatched(CodeTier)(index, cells, persist)

  /** Detect-and-remediate — [[HnswRouted.remediateMergedCells]] on the
    * code representation: [[mergedCellAudit]] → targeted compaction on
    * the flagged cells, PATCHED by default. Returns the remediated
    * index (the input handle when nothing is flagged) and the flagged
    * cell ids. */
  def remediateMergedCells(index: RoutedCodeIndex, minCellRows: Int = 1024,
                           persist: Boolean = true,
                           unpersistPrior: Boolean = true,
                           patched: Boolean = true): (RoutedCodeIndex, Array[Int]) = {
    val flagged = mergedCellAudit(index, minCellRows)
      .filter(col("merged")).select(col("cell"))
      .collect().map(_.getInt(0))
    if (flagged.isEmpty) (index, flagged)
    else if (patched) (compactCellsPatched(index, flagged, persist), flagged)
    else (compactCells(index, flagged, persist, unpersistPrior), flagged)
  }

  // --------------------------------------------------------------------
  // Durability: versioned parquet image + attach-without-rebuild
  // ([[VersionedIndexDirs]] discipline, the float tier's shape on four
  // data tables — meta, anchors, codes, links — plus per-cell entries
  // and the live tombstone set).
  // --------------------------------------------------------------------


  /** Persist as a new complete `idx_v{N}` version (`_DONE` last, older
    * versions reclaimed). A 1e8-code index is ~800 MB of codes + its
    * graphs — the designated 1e8-decade tier no longer costs its full
    * build per session. */
  def save(index: RoutedCodeIndex, path: String, keepVersions: Int = 1): Unit =
    saveWith(SparkSession.active, index, path, keepVersions)

  private def saveWith(spark: SparkSession, index: RoutedCodeIndex,
                       path: String, keepVersions: Int = 1): Unit = {
    import spark.implicits._
    val dir = VersionedIndexDirs.nextDir(spark, path)
    val p = index.params

    Seq((index.seed, p.m.toSeq, p.mMax.toSeq, p.efConstrSearch.toSeq,
        p.efConstrInsert.toSeq, p.efSearch.toSeq, p.layerProbability))
      .toDF("seed", "m", "m_max", "ef_constr_search", "ef_constr_insert",
        "ef_search", "layer_probability")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")

    index.anchors.zipWithIndex.map { case (a, i) => (i, a) }.toSeq
      .toDF("idx", "anchor")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/anchors")

    spark.createDataset(index.shards.flatMap { case (cell, s) =>
      s.codes.toSeq.iterator.map { case (id, c) => (cell, id, c) }
    })(RoutedImage.codeRowEnc).toDF("cell", "id", "code")
      .write.mode("overwrite").parquet(s"$dir/codes")

    RoutedImage.writeGraph(spark, dir, index.shards,
      (s: CodeCellShard) => s.snapshot)
    RoutedImage.writeTombstones(spark, dir, index.tombstones)

    VersionedIndexDirs.commit(spark, path, dir, keepVersions)
  }

  /** Restore WITHOUT rebuilding: newest complete version, one
    * co-partitioned cogroup reassembling per-cell code maps + CSR
    * snapshots — a parquet scan, no k-majority training, no graph
    * construction. Keys are anchor RANKS (0..n-1), so the plain
    * HashPartitioner is the identity here (unlike the float tier's
    * composite ids — see [[HnswRouted.CellPartitioner]]). */
  def attach(spark: SparkSession, path: String,
             persist: Boolean = true,
             storage: org.apache.spark.storage.StorageLevel = DefaultStorage): RoutedCodeIndex = {
    val dir = VersionedIndexDirs.newestDone(spark, path)

    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val params = RoutedImage.paramsFromMeta(meta)
    val seed = meta.getAs[Long]("seed")
    val anchors = spark.read.parquet(s"$dir/anchors").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2)

    val part = new HashPartitioner(math.max(1, anchors.length))
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("cell"), col("id"), col("code")).as(RoutedImage.codeRowEnc).rdd
      .map { case (c, id, code) => (c, (id, code)) }
    val links = RoutedImage.readLinks(spark, dir)
    val entries = RoutedImage.readEntries(spark, dir)

    val shards = codes.cogroup(links, entries, part).mapPartitions({ it =>
      it.map { case (cell, (cs, ls, es)) =>
        cell -> CodeCellShard(cell, LongLongMap.from(cs.iterator, 64),
          RoutedImage.assembleSnapshot(ls, es))
      }
    }, preservesPartitioning = true)
    if (persist) {
      shards.persist(storage).setName("graft-hnsw-routed-codes")
      shards.count()
    }
    RoutedCodeIndex(params, seed, anchors, shards,
      RoutedImage.readTombstones(spark, dir))
  }

  /** Routed Hamming k-NN: (qid, qcode) -> (qid, id, hamming, rank) —
    * the flat tier's output contract ([[HnswCodes.search]]). ef0
    * follows the float tier's density-adaptive default
    * ([[HnswRouted.autoEf]]); explicit ef0 pins the in-cell beam. */
  def search(index: RoutedCodeIndex, queries: DataFrame, k: Int,
             nProbe: Int, ef0: Int = 0): DataFrame =
    searchImpl(index, queries, k, nProbe, ef0, allowed = None)

  /** Attribute-filtered routed Hamming k-NN — the float tier's
    * [[HnswRouted.searchFiltered]] contract on the code
    * representation (allow-set as a sorted broadcast array; per-cell
    * one-beam-then-exact; tombstones compose; exhaustive regime forces
    * the exact path). Above [[HnswRouted.AllowCollectMax]] ids the
    * call reroutes through [[searchFilteredDistributed]] — no
    * driver-side copy at any size (the float tier's cutover). */
  def searchFiltered(index: RoutedCodeIndex, queries: DataFrame,
                     allowed: DataFrame, k: Int, nProbe: Int,
                     ef0: Int = 0): DataFrame =
    RoutedLifecycle.allowProbe(allowed, HnswRouted.AllowCollectMax) match {
      case None =>
        searchFilteredDistributed(index, queries, allowed, k, nProbe, ef0)
      case some =>
        searchImpl(index, queries, k, nProbe, ef0, allowed = some)
    }

  /** Fully distributed filtered serving — the float tier's
    * [[HnswRouted.searchFilteredDistributed]] on the code
    * representation: allow-set joined against the index's own
    * (id → cell) pairs, shuffled by the pinned partitioner, 3-way
    * zipPartitions with shards + routed queries; per-cell sorted allow
    * arrays built executor-side. */
  def searchFilteredDistributed(index: RoutedCodeIndex, queries: DataFrame,
                                allowed: DataFrame, k: Int, nProbe: Int,
                                ef0: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val sc = spark.sparkContext
    val params = index.params
    val p = math.min(nProbe, index.anchors.length)
    val exhaustive = p >= index.anchors.length
    val anchorsB = sc.broadcast(index.anchors)
    val tombB = sc.broadcast(index.tombstones)
    val part = index.shards.partitioner.getOrElse(throw new IllegalStateException(
      "distributed routing needs the index's pinned CellPartitioner"))
    val routed = queries.select(col("qid"), col("qcode")).as(pairEnc).rdd
      .flatMap { case (qid, qc) =>
        probeCellsCode(qc, anchorsB.value, p).map(c => (c, (qid, qc)))
      }.partitionBy(part)
    val allowByCell = RoutedLifecycle.allowByCell(CodeTier)(index, allowed, part)
    import spark.implicits._
    val perShard = RoutedLifecycle.zipServeFiltered(
        index.shards, routed, allowByCell) {
      (m: CodeCellShard, probes: Iterator[(Long, Long)], allow: Array[Long]) =>
        serveCodeShard(params, m, probes, k, ef0, exhaustive,
          hasAllow = true, allow, tombB.value)
    }.toDF("qid", "id", "hamming")
    rankMerge(perShard, k)
  }

  /** Probe set for one query code: the nProbe nearest anchors by
    * Hamming distance, ties by anchor index — shared by both routing
    * paths so routing is path-independent. */
  @inline private def probeCellsCode(qc: Long, anchors: Array[Long],
                                     p: Int): Iterator[Int] = {
    val byDist = Array.tabulate(anchors.length)(a => (a, hamming(qc, anchors(a))))
    java.util.Arrays.sort(byDist,
      Ordering.by[(Int, Int), (Int, Int)](x => (x._2, x._1)))
    byDist.iterator.take(p).map(_._1)
  }

  /** Distributed query routing on the codes tier — the float tier's
    * [[HnswRouted.searchDistributed]] contract at 8 bytes/row: queries
    * stay a DataFrame, fan to their probe cells against the broadcast
    * anchors, and shuffle by the pinned partitioner while the shard
    * side rides narrow. [[search]] auto-selects this path above
    * [[HnswRouted.DriverRouteMax]] queries. */
  def searchDistributed(index: RoutedCodeIndex, queries: DataFrame, k: Int,
                        nProbe: Int, ef0: Int = 0): DataFrame =
    searchImplDistributed(index, queries, k, nProbe, ef0, allowed = None)

  /** Per-shard serving kernel shared by both routing paths (see
    * [[HnswRouted.serveShard]] — this is its Hamming twin). */
  private def serveCodeShard(
      params: HnswParams, m: CodeCellShard,
      probes: Iterator[(Long, Long)],
      k: Int, ef0: Int, exhaustive: Boolean,
      hasAllow: Boolean, allow: Array[Long],
      dead: Array[Long]): Iterator[(Long, Long, Int)] = {
        val searcher = new HnswSearcher(params)
        val store = new CellCodeStore(m.codes)
        val base = params.getEfSearch(0)
        val ef = if (ef0 > 0) math.max(ef0, base)
                 else HnswRouted.autoEf(base, m.codes.size)
        val predicated = hasAllow || dead.nonEmpty
        if (!predicated)
          probes.flatMap { case (qid, qc) =>
            store.stage(-1L, qc)
            searcher.searchWithEf(store, m.snapshot, -1L, k, ef)
              .iterator.map(nb => (qid, nb.dst, nb.dist.toInt))
          }
        else {
          // per-cell overfetch-with-escalation + exact in-cell fallback
          // (HnswRouted.searchImpl's predicated discipline; queue order
          // is total on (dist, id), so the filtered prefix carries the
          // oracle's tie-breaking — load-bearing under INTEGER Hamming
          // distances where ties are the common case). Census machinery
          // is the shared [[PredicatedCensus]] kernel.
          val cen = new PredicatedCensus.Census(
            PredicatedCensus.Members.ofLongLongMap(m.codes),
            hasAllow, allow, dead)
          @inline def eligible(id: Long): Boolean = cen.eligible(id)
          val cellN = cen.cellN
          def exactScan(qid: Long, qc: Long): List[(Long, Long, Int)] =
            PredicatedCensus.exactScanTopK(cen.eligibleIds, k,
                id => hamming(qc, m.codes(id)).toDouble)
              .iterator.map(nb => (qid, nb.dst, nb.dist.toInt)).toList
          val kp0 = math.max(4 * k, ef)
          if (cen.eligibleCount == 0) Iterator.empty
          else if (exhaustive)
            // exhaustive regime: force the exact path so predicated
            // exactness is structural, not small-cell luck (see
            // HnswRouted.searchImpl — the hash-oracle configuration)
            probes.flatMap { case (qid, qc) => exactScan(qid, qc) }
          else if (cen.eligibleCount == cellN)
            // every member of this cell is eligible (no dead id lives
            // here; any allow-set covers it), so the predicated filter
            // is the identity — serve on the UNMODIFIED plain kernel.
            // This makes cell-local deletions cost ~nothing on the
            // untouched cells, which is almost all of them (measured:
            // the predicated wrapper around the same beam ran ~40%
            // slower at 47k tombstones even though the beam parameters
            // are identical — profile/cache effects in the wrapper; the
            // plain path sidesteps the question entirely)
            probes.flatMap { case (qid, qc) =>
              store.stage(-1L, qc)
              searcher.searchWithEf(store, m.snapshot, -1L, k, ef)
                .iterator.map(nb => (qid, nb.dst, nb.dist.toInt))
            }
          else probes.flatMap { case (qid, qc) =>
            store.stage(-1L, qc)
            // density-aware cutover, not just absolute count: a cell
            // whose eligible FRACTION is low defeats the beam — the
            // top-kp0 of a 98%-dead cell holds ~no eligible ids, so
            // nearly every query escalated to the full cell width
            // (measured: a wiped cell with 274 of 15900 eligible
            // stragglers ran 455 escalations for 320 queries — a 1.4 s
            // straggler task that serialized the whole serve). The
            // exact scan is O(eligible) per query and wins decisively
            // below ~25% density.
            if (cen.cutoverToExact(kp0)) exactScan(qid, qc)
            else {
              // ONE overfetched beam, then exact — never escalate
              // in-cell (see HnswRouted.searchImpl: geometric
              // eligibility clustering defeats any cell-wide density
              // census, and the per-cell exact scan costs less than
              // one 4x re-beam)
              val w = searcher.searchWithEf(store, m.snapshot, -1L, kp0, kp0)
              val hits = w.iterator.filter(nb => eligible(nb.dst)).take(k).toList
              if (hits.length >= k) hits.map(nb => (qid, nb.dst, nb.dist.toInt))
              else exactScan(qid, qc)
            }
          }
        }
  }

  /** Global top-k merge (see [[HnswRouted.rankMerge]] — Hamming twin). */
  private def rankMerge(perShard: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("hamming"), col("id"))))
      .filter(col("rank") <= k)
  }

  private def searchImpl(index: RoutedCodeIndex, queries: DataFrame,
                         k: Int, nProbe: Int, ef0: Int,
                         allowed: Option[Array[Long]]): DataFrame = {
    val spark = queries.sparkSession
    val params = index.params
    val anchors = index.anchors
    val p = math.min(nProbe, anchors.length)
    // probe set covers every cell -> predicated serving may guarantee
    // exactness via the per-cell exact scan (HnswRouted.searchImpl)
    val exhaustive = p >= anchors.length
    // driver-side routing with the batch-side cutover (see
    // HnswRouted.searchImpl: the limit guards the collect; a query side
    // beyond DriverRouteMax reroutes through the distributed path)
    val qArr = queries.select(col("qid"), col("qcode"))
      .limit(HnswRouted.DriverRouteMax + 1).as(pairEnc).collect()
    if (qArr.length > HnswRouted.DriverRouteMax)
      return searchImplDistributed(index, queries, k, nProbe, ef0, allowed)
    val byCell = qArr.iterator.flatMap { case (qid, qc) =>
      probeCellsCode(qc, anchors, p).map(c => (c, (qid, qc)))
    }.toArray.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val qB = spark.sparkContext.broadcast(byCell)
    val hasAllow = allowed.nonEmpty
    val allowB = spark.sparkContext.broadcast(allowed.getOrElse(Array.empty[Long]))
    val tombB = spark.sparkContext.broadcast(index.tombstones)
    import spark.implicits._
    // schedule ONLY the probed cells' partitions (the 1e8 finding: at
    // 1024 cells the full pass costs 1024 task launches for 8 working
    // cells — see HnswRouted.prunedShards)
    val perShard = HnswRouted.prunedShards(index.shards, byCell.keys)
      .flatMap { case (_, m) =>
        val probes = qB.value.getOrElse(m.cell, Array.empty[(Long, Long)])
        if (probes.isEmpty) Iterator.empty
        else serveCodeShard(params, m, probes.iterator, k, ef0, exhaustive,
          hasAllow, allowB.value, tombB.value)
      }.toDF("qid", "id", "hamming")
    rankMerge(perShard, k)
  }

  private[hnsw] def searchImplDistributed(
      index: RoutedCodeIndex, queries: DataFrame, k: Int,
      nProbe: Int, ef0: Int, allowed: Option[Array[Long]]): DataFrame = {
    val spark = queries.sparkSession
    val sc = spark.sparkContext
    val params = index.params
    val p = math.min(nProbe, index.anchors.length)
    val exhaustive = p >= index.anchors.length
    val anchorsB = sc.broadcast(index.anchors)
    val hasAllow = allowed.nonEmpty
    val allowB = sc.broadcast(allowed.getOrElse(Array.empty[Long]))
    val tombB = sc.broadcast(index.tombstones)
    val part = index.shards.partitioner.getOrElse(throw new IllegalStateException(
      "distributed routing needs the index's pinned CellPartitioner"))
    // only the query side shuffles (8 B code + 8 B qid per probe row);
    // the shard side rides a narrow zipPartitions
    val routed = queries.select(col("qid"), col("qcode")).as(pairEnc).rdd
      .flatMap { case (qid, qc) =>
        probeCellsCode(qc, anchorsB.value, p).map(c => (c, (qid, qc)))
      }.partitionBy(part)
    import spark.implicits._
    val perShard = index.shards.zipPartitions(routed) { (shardIt, qIt) =>
      val shards = shardIt.toArray
      if (shards.length == 0) Iterator.empty
      else if (shards.length == 1) {
        val (cell, m) = shards(0)
        val probes = qIt.collect { case (c, q) if c == cell => q }
        serveCodeShard(params, m, probes, k, ef0, exhaustive,
          hasAllow, allowB.value, tombB.value)
      } else {
        val byCell = qIt.toArray.groupBy(_._1)
        shards.iterator.flatMap { case (cell, m) =>
          serveCodeShard(params, m,
            byCell.getOrElse(cell, Array.empty).iterator.map(_._2),
            k, ef0, exhaustive, hasAllow, allowB.value, tombB.value)
        }
      }
    }.toDF("qid", "id", "hamming")
    rankMerge(perShard, k)
  }

  /** Read-through code store with one stageable query slot (the
    * HnswCodes.CodeStoreWithIds shape, shard-local). */
  private final class CellCodeStore(val codes: LongLongMap)
      extends graft.store.VectorStore {
    type Raw = Long
    private var qId = Long.MinValue
    private var qCode = 0L
    def stage(id: Long, code: Long): Unit = { qId = id; qCode = code }
    private def codeOf(id: Long): Long = if (id == qId) qCode else codes(id)
    override def prepareQuery(raw: Long): Long =
      throw new UnsupportedOperationException("use stage(id, code)")
    override def insert(q: Long): Long = q
    override def evalDistance(q: Long, v: Long): Double =
      java.lang.Long.bitCount(codeOf(q) ^ codeOf(v)).toDouble
    override def isMatch(d: Double): Boolean = d <= 0.0
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, RoutedCodeIndex]()

  /** Release every memoized handle (see [[IndexCaches]]); shared shard
    * RDDs may unpersist twice — idempotent. */
  private[hnsw] def releaseCaches(): Unit = {
    cache.values.forEach(_.shards.unpersist())
    cache.clear()
  }

  /** Nest-safe memo (see [[HnswRouted.memo]]: the lifecycle handles
    * nest, and nested computeIfAbsent throws "Recursive update"). */
  private def memo(key: String)(mk: => RoutedCodeIndex): RoutedCodeIndex = {
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val v = mk
      val prev = cache.putIfAbsent(key, v)
      // the losing build's shards are persisted and unreachable —
      // release them rather than leak executor storage
      if (prev != null) { v.shards.unpersist(); prev } else v
    }
  }

  def buildCached(codes: DataFrame, params: HnswParams, nCells: Int,
                  seed: Long, key: String): RoutedCodeIndex =
    memo(
      Seq(codes.sparkSession.sparkContext.applicationId, key, nCells, seed,
        params.m.toList, params.mMax.toList, params.efConstrSearch.toList,
        params.efConstrInsert.toList, params.efSearch.toList,
        params.layerProbability).mkString("|"))(
      graft.BuildLedger.timed("hnsw_routed_codes_build")(
        build(codes, params, nCells, seed)))

  /** Memoized save+attach round-trip — the catalog's durable-tier
    * serving handle for the code representation (built once, persisted
    * once, served from the ATTACHED copy so the oracle rides the
    * restore path). */
  def attachCached(codes: DataFrame, params: HnswParams, nCells: Int,
                   seed: Long, key: String): RoutedCodeIndex =
    memo(
      Seq(codes.sparkSession.sparkContext.applicationId, "attach", key,
        nCells, seed, params.m.toList, params.mMax.toList,
        params.efConstrSearch.toList, params.efConstrInsert.toList,
        params.efSearch.toList, params.layerProbability).mkString("|"))(
      graft.BuildLedger.timed("hnsw_routed_codes_save_attach") {
        val built = buildCached(codes, params, nCells, seed, key)
        val dir = graft.TempDirs.create("graft_routed_codes_")
        saveWith(codes.sparkSession, built, dir)
        attach(codes.sparkSession, dir)
      })

  /** Memoized build-then-ingest — the incremental-growth handle: the
    * base corpus builds, the tail INGESTS per cell, the grown index is
    * held to the same exhaustive-regime oracle as a from-scratch
    * build. */
  def growCached(baseCodes: DataFrame, newRows: DataFrame,
                 params: HnswParams, nCells: Int, seed: Long,
                 key: String): RoutedCodeIndex =
    memo(
      Seq(baseCodes.sparkSession.sparkContext.applicationId, "grow", key,
        nCells, seed, params.m.toList, params.mMax.toList,
        params.efConstrSearch.toList, params.efConstrInsert.toList,
        params.efSearch.toList, params.layerProbability).mkString("|"))(
      graft.BuildLedger.timed("hnsw_routed_codes_grow") {
        ingest(build(baseCodes, params, nCells, seed), newRows)
      })

  /** Memoized tombstone-serving handle over the SHARED cached build
    * ([[HnswRouted.deleteCached]]'s contract): delete is O(set) handle
    * metadata, the shards are the plain row's. */
  def deleteCached(codes: DataFrame, deleted: DataFrame,
                   params: HnswParams, nCells: Int, seed: Long,
                   key: String, delKey: String): RoutedCodeIndex =
    memo(
      Seq(codes.sparkSession.sparkContext.applicationId, "tomb", key,
        delKey, nCells, seed, params.m.toList, params.mMax.toList,
        params.efConstrSearch.toList, params.efConstrInsert.toList,
        params.efSearch.toList, params.layerProbability).mkString("|"))(
      delete(buildCached(codes, params, nCells, seed, key), deleted))

  /** Memoized compaction of the cached tombstoned index
    * ([[HnswRouted.compactCached]]'s contract — affected cells rebuild,
    * untouched cells pass through; the prior shards stay cached for the
    * sibling rows). */
  def compactCached(codes: DataFrame, deleted: DataFrame,
                    params: HnswParams, nCells: Int, seed: Long,
                    key: String, delKey: String): RoutedCodeIndex =
    memo(
      Seq(codes.sparkSession.sparkContext.applicationId, "compact", key,
        delKey, nCells, seed, params.m.toList, params.mMax.toList,
        params.efConstrSearch.toList, params.efConstrInsert.toList,
        params.efSearch.toList, params.layerProbability).mkString("|"))(
      graft.BuildLedger.timed("hnsw_routed_codes_compact") {
        compact(deleteCached(codes, deleted, params, nCells, seed, key, delKey),
          unpersistPrior = false)
      })
}
