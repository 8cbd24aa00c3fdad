package graft.hnsw

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PqKernels
import graft.operators.{Ivf, Pq}
import graft.store.{AdcVectorStore, EntryPoint, GraphSnapshot, LayerCsr}

/** Routed + PQ compose — per-cell ADC codes on the routed serving tier:
  * the beyond-memory shape at the SCALE tier. [[HnswRouted]] holds full
  * float vectors per cell (dim=64 → 256 B/row); this tier derives from
  * a built routed index by PQ-encoding each cell's vectors (8 B/row,
  * 32x smaller) while REUSING the cell graphs as built — so what an
  * executor holds per cell is the layered graph plus codes, and the
  * full-precision table is touched only by the final exact re-rank join
  * ([[HnswPq]]'s DiskANN-style discipline, per cell). At 1e8 rows the
  * difference is ~25 GB of vectors vs ~0.8 GB of codes across the
  * fleet's cells — the margin between fitting executor memory and not.
  *
  * Serving: driver-routed like [[HnswRouted.search]] (query batch ≪
  * corpus), per probed cell an ADC-space candidate stage — the graph
  * beam in the nProbe regime, an exact ADC scan in the exhaustive
  * regime or when the cell is small/mostly-ineligible (the routed
  * tier's one-beam-then-exact discipline, in ADC space) — then ONE
  * exact squared-L2 re-rank join of the candidate union against the
  * distributed raw-vector table ([[Pq.rerank]]).
  *
  * Accuracy contract (the honest PQ note): ADC is lossy, so unlike the
  * float routed tier the exhaustive regime is NOT structurally exact —
  * a true neighbor can rank beyond the per-cell candidate budget no
  * matter how exact the in-cell scan. What the exhaustive regime DOES
  * guarantee is that every cell contributes its true ADC-top-C, so
  * candidate recall is limited only by quantization, not routing; with
  * a generous C the re-ranked top-k matches the exact oracle at
  * catalog scale (the `h_knn_cosine` empirical-exactness bar — verified
  * set-identical, held to the hash oracle), and `h_recall_routed_pq`
  * measures the honest nProbe regime. Distance contract: ADC
  * reconstructs squared L2, so the underlying routed graphs must be
  * BUILT with the l2 metric (asserted) for traversal order to agree
  * with candidate order.
  *
  * Tombstones carry over from the source index and are excluded from
  * the candidate stage (sorted-array membership, the routed tier's
  * predicate shape). Lifecycle: [[delete]] is O(set) metadata; with a
  * live float source, fold/grow THERE and [[rederive]] (touched cells
  * only); with no float source — the [[attach]]ed posture — the SOLO
  * lifecycle serves: [[ingest]] (ADC-space insert, quantize-on-
  * insert), [[compactSolo]] (touched-cell rebuild from the raw-vector
  * table), [[save]]/[[attach]] durability, and the filtered serving
  * surface ([[searchFiltered]]/[[searchFilteredDistributed]]).
  */
object HnswRoutedPq {

  /** One cell's serving state: graph + codes, NO raw vectors.
    * `fingerprint` is an order-independent 64-bit content digest of the
    * (id, vec) pairs the codes were encoded from — [[rederive]] compares
    * it against the source cell's current content to decide carry-over
    * vs re-encode without ever holding the old vectors. */
  /** `codes` is the repo's PRIMITIVE LongLongMap, not
    * scala.collection.mutable.LongMap: the scala map boxes its values
    * (16+ B/row of pure overhead at 1e8) AND carries a defaultEntry
    * closure field that corrupts under the Kryo round-trip a
    * DISK_ONLY shard pays — the 1e7 pq_solo_build rung SIGSEGV'd the
    * JVM reading a deserialized one. The primitive map is the codes
    * tier's shape, proven through Kryo + DISK_ONLY at 1e8. */
  final case class PqCellShard(
      cell: Int,
      codes: LongLongMap,
      snapshot: GraphSnapshot,
      fingerprint: Long
  ) extends Serializable

  /** splitmix64 finalizer (the repo's standard mixer). */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Order-independent content digest of a cell's (id, vec) map: each
    * row hashes (id, raw float bits) through an xxhash-style fold +
    * splitmix finalizer; rows combine by ADDITION so iteration order
    * cannot matter. Cost ~len+5 integer ops per row — ~250x cheaper
    * than the encode it lets [[rederive]] skip. A colliding pair of
    * DIFFERENT cell contents would carry stale codes (coarse-stage
    * noise only — the exact re-rank still orders true candidates);
    * at 64 well-mixed bits per cell the chance is ~nCells/2^64 per
    * rederive, far below any operational concern. */
  private[hnsw] def contentFingerprint(vectors: LongVecMap): Long =
    contentFingerprintRows(vectors.iterator)

  /** Same fold over a row iterator (order-independent by the addition
    * combine) — the [[buildSolo]] path digests the build rows directly
    * without materializing a float map it would immediately drop. */
  private[hnsw] def contentFingerprintRows(
      rows: Iterator[(Long, Array[Float])]): Long = {
    var acc = 0L
    rows.foreach { case (id, v) =>
      var h = id * 0x9E3779B97F4A7C15L
      var i = 0
      while (i < v.length) {
        h = (h ^ java.lang.Float.floatToRawIntBits(v(i)).toLong) *
          0xC2B2AE3D27D4EB4FL
        i += 1
      }
      acc += mix64(h)
    }
    acc
  }

  /** `buildSeed` is the SOURCE index's build seed (cfg.seed),
    * persisted through save/attach: solo rebuilds ([[compactSolo]])
    * and solo ingest layer draws use it so a solo-compacted cell is
    * graph-identical to the float tier's rebuild of the same
    * survivors — not just content-identical (the pre-round-16 gap:
    * a hardcoded seed 13 made the equivalence content-level only). */
  final case class RoutedPqIndex(
      params: HnswParams,
      router: HnswRouted.Router,
      codebook: Array[Array[Array[Float]]],
      shards: org.apache.spark.rdd.RDD[(Int, PqCellShard)],
      tombstones: Array[Long],
      buildSeed: Long = 13L,
      // patch RDDs still pinned under `shards` (the
      // [[compactSoloCellsPatched]] rebuilt-cells overlay) — released
      // by [[foldOverlay]] or [[unpersist]]
      overlay: Seq[org.apache.spark.rdd.RDD[_]] = Nil) {
    def unpersist(): Unit = {
      overlay.foreach(_.unpersist())
      shards.unpersist()
    }
  }

  /** The PQ tier's [[RoutedTier]] binding — the shared lifecycle's
    * delete/foldOverlay/guards/removed-collection run through it; the
    * LOCAL survivor rebuild is deliberately unbound (a solo cell
    * rebuild fetches survivor floats from the raw-vector table — the
    * [[compactSolo]] family is the tier-specific path). */
  private[graft] object PqTier extends RoutedTier[PqCellShard, RoutedPqIndex] {
    def shards(i: RoutedPqIndex): org.apache.spark.rdd.RDD[(Int, PqCellShard)] = i.shards
    def tombstones(i: RoutedPqIndex): Array[Long] = i.tombstones
    def overlays(i: RoutedPqIndex): Seq[org.apache.spark.rdd.RDD[_]] = i.overlay
    def make(i: RoutedPqIndex, shards: org.apache.spark.rdd.RDD[(Int, PqCellShard)],
             tombstones: Array[Long],
             overlays: Seq[org.apache.spark.rdd.RDD[_]]): RoutedPqIndex =
      RoutedPqIndex(i.params, i.router, i.codebook, shards, tombstones,
        i.buildSeed, overlays)
    val cacheName = "graft-hnsw-routed-pq"
    val tierName = "routed-pq"
    val unpersistBlocking = false
    val resurrectHint = "Run compactSolo() first (frees the ids), or " +
      "rederive from a compacted float source"
    def memberCount(s: PqCellShard): Int = s.codes.size
    def containsId(s: PqCellShard, id: Long): Boolean = s.codes.contains(id)
    def idIterator(s: PqCellShard): Iterator[Long] = s.codes.keysIterator
    def survivorRebuild(i: RoutedPqIndex): (Int, PqCellShard, Array[Long]) => PqCellShard =
      throw new UnsupportedOperationException(
        "routed-pq: local survivor rebuild needs the raw-vector table — " +
          "use compactSolo/compactSoloCells")
  }

  /** Derive the PQ serving tier from a built routed index: train one
    * GLOBAL codebook on a per-cell-capped driver sample (≤ `sampleMax`
    * vectors — a global codebook keeps ADC comparable across cells so
    * the cross-cell merge orders correctly; per-cell codebooks would
    * need per-cell re-rank before any merge), then ONE narrow encode
    * pass over the shards (no shuffle — cell graphs and the pinned
    * partitioner are reused as-is). The float shards are NOT
    * unpersisted: the caller owns the source index (catalog rows keep
    * serving it). */
  def fromRouted(index: HnswRouted.RoutedIndex, seed: Long = 13L,
                 persist: Boolean = true,
                 sampleMax: Int = 100000): RoutedPqIndex = {
    require(index.cfg.metric == "l2",
      s"HnswRoutedPq serves squared-L2 (ADC); routed graphs were built " +
        s"with ${index.cfg.metric} — traversal order would disagree " +
        "with candidate order")
    val nCells = math.max(1, index.router.allCells.size)
    val perCell = math.max(1, sampleMax / nCells)
    // per-cell-capped sample: every cell contributes, so the codebook
    // sees the full support even when k-means packed most rows into a
    // few cells (a head-only sample would quantize the tail badly)
    val sample = index.shards.flatMap { case (_, s) =>
      s.vectors.valuesIterator.take(perCell)
    }.collect()
    val codebook = HnswPq.trainOnArrays(sample, seed)
    fromRoutedWith(index, codebook, persist)
  }

  /** Derive the PQ tier with a PRE-TRAINED codebook: one narrow encode
    * pass, no sample, no training — the path [[rederive]] takes when the
    * source index was retrained/re-attached (the codebook survives the
    * router: it quantizes vector CONTENT, which retrain does not change;
    * [[HnswRouted.driftAudit]] is the signal for when content drift
    * warrants a fresh [[fromRouted]] training pass). */
  def fromRoutedWith(index: HnswRouted.RoutedIndex,
                     codebook: Array[Array[Array[Float]]],
                     persist: Boolean = true): RoutedPqIndex = {
    require(index.cfg.metric == "l2",
      s"HnswRoutedPq serves squared-L2 (ADC); routed graphs were built " +
        s"with ${index.cfg.metric} — traversal order would disagree " +
        "with candidate order")
    val sc = index.shards.sparkContext
    val cbB = sc.broadcast(codebook)
    val shards = index.shards.mapPartitions({ it =>
      it.map { case (cell, s) => cell -> encodeShard(s, cbB.value) }
    }, preservesPartitioning = true)
    if (persist) {
      shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-routed-pq")
      shards.count()
    }
    RoutedPqIndex(index.cfg.params, index.router, codebook, shards,
      index.tombstones, buildSeed = index.cfg.seed)
  }

  /** Build the PQ tier DIRECTLY from a vector table — no float index
    * is ever materialized, on this host or anywhere. The missing piece
    * of the 100 TB story until round 16: [[fromRouted]] derives from a
    * BUILT float tier, so creating the compressed tier transiently
    * required the uncompressed one resident (~25 GB of vectors per
    * 1e8 rows the serving fleet never wanted). Here the floats stream
    * through the build tasks and are dropped as each cell finishes:
    *
    *  1. codebook trained on a hash-decimated driver sample of the
    *     input (or supplied — the retrain/refresh path);
    *  2. router planned by the float tier's own machinery
    *     ([[HnswRouted.planRouter]]: k-means primary, skew-guard
    *     secondary splits) — same Router type, same pinned
    *     partitioner, so every downstream op (serve, ingest, delete,
    *     compactSolo, save/attach, rederive-by-fingerprint against a
    *     float source built later) composes unchanged;
    *  3. ONE shuffle of (id, vec) to cells, then per cell the SOLO
    *     ingest kernel builds the graph in ADC space (the new point's
    *     raw float serves its own insertion beam, then drops to code
    *     precision — [[AdcVectorStore]]'s quantize-on-insert), codes
    *     encode, and a TRUE content fingerprint digests the rows.
    *
    * What a task retains per cell is graph + 8 B/row codes; the cell's
    * float slice is transient build scratch. Accuracy follows the solo
    * ingest contract (graph edges chosen by reconstruction distances;
    * the exact re-rank join restores end-to-end exactness — the
    * `h_knn_routed_pq_solo` bar). `storage` defaults to the float
    * tier's MEMORY_AND_DISK; pass DISK_ONLY for the local disk
    * decades (the codes tier's discipline). */
  /** `dedupIds`/`pinInput` are 1e8-decade levers, measured on the rung:
    * the global id-dedup is a full-corpus `groupBy(id).agg(max(vec))`
    * whose PARTIAL aggregation holds one 264-byte array entry per
    * distinct key per task — on a table whose ids are already unique
    * (every group size 1: a primary-keyed pipeline, a generator) that
    * state is pure execution-memory burn and blew the 1e8 build's hash
    * aggregate before a single cell was touched. `dedupIds = false`
    * skips the shuffle when the CALLER guarantees id uniqueness (the
    * per-cell build still fail-fasts on an in-cell duplicate).
    * `pinInput = false` skips caching the projection for inputs that
    * are cheap to recompute (a generator, an already-checkpointed
    * table) — the router-planning passes re-read the input ~3 times,
    * which beats pinning another full-corpus copy onto the disk budget
    * the index itself needs. Defaults keep the safe behavior. */
  def buildSolo(vectors: DataFrame,
                cfg: HnswDistributed.BuildConfig,
                nCells: Int = 16,
                codebook: Array[Array[Array[Float]]] = null,
                codebookSeed: Long = 13L,
                sampleMax: Int = 100000,
                persist: Boolean = true,
                maxCellRows: Long = HnswRouted.DefaultMaxCellRows,
                storage: org.apache.spark.storage.StorageLevel =
                  org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
                modalitySplit: Boolean = false,
                dedupIds: Boolean = true,
                pinInput: Boolean = true): RoutedPqIndex = {
    require(cfg.metric == "l2",
      "HnswRoutedPq serves squared-L2 (ADC); build with the l2 metric")
    val spark = vectors.sparkSession
    val projected = vectors.select(col("id"), col("vec"))
    val deduped0 =
      if (dedupIds) projected.groupBy(col("id")).agg(max(col("vec")).as("vec"))
      else projected
    val deduped =
      if (pinInput)
        deduped0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else deduped0
    try {
      val cb =
        if (codebook != null) codebook
        else {
          // hash-decimated, id-sorted driver sample (the trainAnchors
          // discipline: order-independent selection, bounded collect)
          val total = deduped.count()
          val stride = math.max(1L,
            (total + math.max(1, sampleMax) - 1) / math.max(1, sampleMax))
          val sample = deduped
            .filter(pmod(xxhash64(col("id"), lit(codebookSeed)),
              lit(stride)) === 0L)
            .select(col("id"), col("vec")).as(pairEnc)
            .collect().sortBy(_._1).take(sampleMax).map(_._2)
          require(sample.nonEmpty, "empty codebook training set")
          HnswPq.trainOnArrays(sample, codebookSeed)
        }
      val (router, cells) = HnswRouted.planRouter(deduped, cfg, nCells,
        maxCellRows, modalitySplit)
      val part = HnswRouted.partitionerFor(router)
      val keyed = cells
        .select(col("id"), col("vec"), col("cell"))
        .as(tripleEnc).rdd
        .map { case (id, vec, cell) => (cell, (id, vec)) }
        .partitionBy(part)
      val cbB = spark.sparkContext.broadcast(cb)
      val params = cfg.params
      val seed = cfg.seed
      val shards = keyed.mapPartitions({ it =>
        val byCell = scala.collection.mutable.Map
          .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]]
        it.foreach { case (cell, row) =>
          byCell.getOrElseUpdate(cell,
            scala.collection.mutable.ArrayBuffer.empty) += row
        }
        byCell.iterator.map { case (cell, buf) =>
          val rows = buf.toArray.sortBy(_._1)
          // the documented dedupIds=false fail-fast: rows are id-sorted,
          // so a duplicate is adjacent — without this the second insert
          // would silently self-edge the graph and clobber the code map
          var i = 1
          while (i < rows.length) {
            require(rows(i)._1 != rows(i - 1)._1,
              s"buildSolo: duplicate id ${rows(i)._1} in cell $cell " +
                "(pass dedupIds=true or dedupe the source)")
            i += 1
          }
          cell -> buildCellSolo(cell, rows, cbB.value, params, seed)
        }
      }, preservesPartitioning = true)
      if (persist) {
        shards.persist(storage).setName("graft-hnsw-routed-pq")
        shards.count()
      }
      RoutedPqIndex(params, router, cb, shards, Array.empty,
        buildSeed = cfg.seed)
    } finally if (pinInput) { deduped.unpersist(blocking = false); () }
  }

  /** Encode one float cell shard: codes + content fingerprint. */
  private def encodeShard(s: HnswRouted.CellShard,
                          cb: Array[Array[Array[Float]]]): PqCellShard = {
    val codes = new LongLongMap(s.vectors.size)
    s.vectors.foreach { case (id, v) =>
      codes.put(id, PqKernels.encodeArray(v, cb))
    }
    PqCellShard(s.cell, codes, s.snapshot, contentFingerprint(s.vectors))
  }

  private val pairEnc = Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)

  /** ADC-space candidates: (qid, id, adc), up to `candidates` rows per
    * (query, probed cell). The per-cell stage is the routed tier's
    * one-beam-then-exact discipline transplanted to ADC space:
    * exhaustive regime / small / mostly-dead cells take the exact ADC
    * scan (O(eligible) LUT lookups per query — 16 adds per row), the
    * nProbe regime takes one graph beam and falls back to the scan if
    * the eligible prefix comes up short. Routing follows the routed
    * tier's two-path discipline: driver collect below
    * [[HnswRouted.DriverRouteMax]], distributed (query-side-only
    * shuffle keyed by the pinned partitioner, narrow zipPartitions on
    * the shard side) above it — same kernel, spec-pinned identical. */
  def searchCoarse(index: RoutedPqIndex, queries: DataFrame,
                   candidates: Int, nProbe: Int, ef0: Int = 0): DataFrame =
    searchCoarseImpl(index, queries, candidates, nProbe, ef0, allowed = None)

  private def searchCoarseImpl(index: RoutedPqIndex, queries: DataFrame,
                               candidates: Int, nProbe: Int, ef0: Int,
                               allowed: Option[Array[Long]]): DataFrame = {
    val spark = queries.sparkSession
    val router = index.router
    val exhaustive = nProbe >= router.nPrimary
    val qArr = queries.select(col("qid"), col("qvec"))
      .limit(HnswRouted.DriverRouteMax + 1).as(pairEnc).collect()
    if (qArr.length > HnswRouted.DriverRouteMax)
      return searchCoarseDistributedImpl(index, queries, candidates, nProbe,
        ef0, allowed)
    val byCell = qArr.iterator.flatMap { case (qid, qv) =>
      router.probeCells(qv, nProbe).map(c => (c, (qid, qv)))
    }.toArray.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val qB = spark.sparkContext.broadcast(byCell)
    val cbB = spark.sparkContext.broadcast(index.codebook)
    val tombB = spark.sparkContext.broadcast(index.tombstones)
    val hasAllow = allowed.isDefined
    val allowB = spark.sparkContext.broadcast(
      allowed.getOrElse(Array.empty[Long]))
    import spark.implicits._
    HnswRouted.prunedShards(index.shards, byCell.keys).flatMap { case (_, m) =>
      val probes = qB.value.getOrElse(m.cell, Array.empty[(Long, Array[Float])])
      if (probes.isEmpty) Iterator.empty
      else serveAdcShard(index.params, m, cbB.value, tombB.value,
        probes.iterator, candidates, exhaustive, ef0, hasAllow, allowB.value)
    }.toDF("qid", "id", "adc")
  }

  /** Distributed-routing twin of [[searchCoarse]] (the batch-side
    * shape; see [[HnswRouted.searchDistributed]]). */
  def searchCoarseDistributed(index: RoutedPqIndex, queries: DataFrame,
                              candidates: Int, nProbe: Int,
                              ef0: Int = 0): DataFrame =
    searchCoarseDistributedImpl(index, queries, candidates, nProbe, ef0,
      allowed = None)

  private def searchCoarseDistributedImpl(
      index: RoutedPqIndex, queries: DataFrame,
      candidates: Int, nProbe: Int, ef0: Int,
      allowed: Option[Array[Long]]): DataFrame = {
    val spark = queries.sparkSession
    val sc = spark.sparkContext
    val exhaustive = nProbe >= index.router.nPrimary
    val routerB = sc.broadcast(index.router)
    val cbB = sc.broadcast(index.codebook)
    val tombB = sc.broadcast(index.tombstones)
    val hasAllow = allowed.isDefined
    val allowB = sc.broadcast(allowed.getOrElse(Array.empty[Long]))
    val part = index.shards.partitioner.getOrElse(throw new IllegalStateException(
      "distributed routing needs the index's pinned CellPartitioner"))
    val routed = queries.select(col("qid"), col("qvec")).as(pairEnc).rdd
      .flatMap { case (qid, qv) =>
        routerB.value.probeCells(qv, nProbe).map(c => (c, (qid, qv)))
      }.partitionBy(part)
    import spark.implicits._
    index.shards.zipPartitions(routed) { (shardIt, qIt) =>
      val shards = shardIt.toArray
      if (shards.length == 0) Iterator.empty
      else if (shards.length == 1) {
        val (cell, m) = shards(0)
        val probes = qIt.collect { case (c, q) if c == cell => q }
        serveAdcShard(index.params, m, cbB.value, tombB.value,
          probes, candidates, exhaustive, ef0, hasAllow, allowB.value)
      } else {
        val byCell = qIt.toArray.groupBy(_._1)
        shards.iterator.flatMap { case (cell, m) =>
          serveAdcShard(index.params, m, cbB.value, tombB.value,
            byCell.getOrElse(cell, Array.empty).iterator.map(_._2),
            candidates, exhaustive, ef0, hasAllow, allowB.value)
        }
      }
    }.toDF("qid", "id", "adc")
  }

  /** Attribute-filtered routed+PQ k-NN — the float tier's
    * [[HnswRouted.searchFiltered]] contract on the compressed tier:
    * top-k among only the ids in `allowed` (one id column), tombstones
    * composing (allowed AND not deleted), ADC candidates per probed
    * cell, ONE exact re-rank join against the raw-vector table. The
    * allow-set broadcasts as a sorted primitive array while it fits
    * [[HnswRouted.AllowCollectMax]]; above the cutover the call
    * reroutes through [[searchFilteredDistributed]] — no driver-side
    * copy of either large input at any size. */
  def searchFiltered(index: RoutedPqIndex, queries: DataFrame,
                     vectors: DataFrame, allowed: DataFrame,
                     k: Int, nProbe: Int, candidates: Int,
                     ef0: Int = 0): DataFrame = {
    RoutedLifecycle.allowProbe(allowed, HnswRouted.AllowCollectMax) match {
      case None =>
        searchFilteredDistributed(index, queries, vectors, allowed, k,
          nProbe, candidates, ef0)
      case Some(probe) =>
        searchFilteredIds(index, queries, vectors, probe, k, nProbe,
          candidates, ef0)
    }
  }

  /** [[searchFiltered]] with a pre-collected allow-set (sorted
    * ascending, duplicate-free) — the repeat-caller path. */
  def searchFilteredIds(index: RoutedPqIndex, queries: DataFrame,
                        vectors: DataFrame, allowedIds: Array[Long],
                        k: Int, nProbe: Int, candidates: Int,
                        ef0: Int = 0): DataFrame = {
    val coarse = searchCoarseImpl(index, queries, math.max(candidates, k),
      nProbe, ef0, allowed = Some(allowedIds)).select(col("qid"), col("id"))
    Pq.rerank(coarse, vectors, queries, k)
  }

  /** Fully distributed attribute-filtered serving on the PQ tier — the
    * float tier's [[HnswRouted.searchFilteredDistributed]] transport
    * with the ADC kernel: no driver-side materialization of the query
    * batch OR the allow-set. The allow-set joins the index's own
    * (id → cell) pairs (narrow flatMap over the shards' code keys —
    * each id lives in exactly one cell, so the join output is |allow|
    * rows), shuffles by the pinned partitioner, and rides a 3-way
    * zipPartitions with the shards and the routed queries; the
    * per-cell sorted allow array is built executor-side. */
  def searchFilteredDistributed(index: RoutedPqIndex, queries: DataFrame,
                                vectors: DataFrame, allowed: DataFrame,
                                k: Int, nProbe: Int, candidates: Int,
                                ef0: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val sc = spark.sparkContext
    val exhaustive = nProbe >= index.router.nPrimary
    val routerB = sc.broadcast(index.router)
    val cbB = sc.broadcast(index.codebook)
    val tombB = sc.broadcast(index.tombstones)
    val part = index.shards.partitioner.getOrElse(throw new IllegalStateException(
      "distributed routing needs the index's pinned CellPartitioner"))
    val routed = queries.select(col("qid"), col("qvec")).as(pairEnc).rdd
      .flatMap { case (qid, qv) =>
        routerB.value.probeCells(qv, nProbe).map(c => (c, (qid, qv)))
      }.partitionBy(part)
    val allowByCell = RoutedLifecycle.allowByCell(PqTier)(index, allowed, part)
    import spark.implicits._
    val c = math.max(candidates, k)
    val params = index.params
    val coarse = RoutedLifecycle.zipServeFiltered(
        index.shards, routed, allowByCell) {
      (m: PqCellShard, probes: Iterator[(Long, Array[Float])], allow: Array[Long]) =>
        serveAdcShard(params, m, cbB.value, tombB.value,
          probes, c, exhaustive, ef0, hasAllow = true, allow)
    }.toDF("qid", "id", "adc").select(col("qid"), col("id"))
    Pq.rerank(coarse, vectors, queries, k)
  }

  /** Per-shard ADC candidate kernel, shared by both routing paths and
    * the filtered variants. `allow` is a sorted allow-set (the
    * attribute predicate's id list — [[HnswRouted.serveShard]]'s
    * contract): an id serves only if allowed AND not tombstoned. */
  private def serveAdcShard(
      params: HnswParams, m: PqCellShard,
      cb: Array[Array[Array[Float]]], dead: Array[Long],
      probes: Iterator[(Long, Array[Float])],
      candidates: Int, exhaustive: Boolean,
      ef0: Int, hasAllow: Boolean = false,
      allow: Array[Long] = Array.empty): Iterator[(Long, Long, Double)] = {
        // census/eligibleIds/exact-scan machinery is the shared
        // [[PredicatedCensus]] kernel (one copy across the three routed
        // tiers) — which also gives this tier the small-allow
        // eligibleIds fast path the float/codes twins had
        val cen = new PredicatedCensus.Census(
          PredicatedCensus.Members.ofLongLongMap(m.codes),
          hasAllow, allow, dead)
        @inline def eligible(id: Long): Boolean = cen.eligible(id)
        val cellN = cen.cellN
        val searcher = new HnswSearcher(params)
        val store = new AdcVectorStore(cb, m.codes(_))
        val base = params.getEfSearch(0)
        val ef = if (ef0 > 0) math.max(ef0, base)
                 else HnswRouted.autoEf(base, cellN)
        val c = math.max(1, candidates)
        // exact ADC scan: k-bounded queue selection over the eligible
        // ids (the routed exactScan, with the LUT kernel per query)
        def adcScan(qid: Long, qvec: Array[Float]): Iterator[(Long, Long, Double)] = {
          val lut = PqKernels.lutFor(qvec, cb)
          PredicatedCensus.exactScanTopK(cen.eligibleIds, c,
              id => PqKernels.adcLut(lut, m.codes(id)))
            .iterator.map(nb => (qid, nb.dst, nb.dist))
        }
        if (cen.eligibleCount == 0) Iterator.empty
        else probes.flatMap { case (qid, qvec) =>
          if (exhaustive || cen.cutoverToExact(c))
            adcScan(qid, qvec)
          else {
            val q = store.prepareQueryWithId(-1L, qvec)
            val beam = math.max(c, ef)
            val w = searcher.searchWithEf(store, m.snapshot, q, beam, beam)
            val hits = w.iterator.filter(nb => eligible(nb.dst)).take(c).toList
            if (hits.length >= math.min(c, cen.eligibleCount))
              hits.iterator.map(nb => (qid, nb.dst, nb.dist))
            else adcScan(qid, qvec)
          }
        }
  }

  /** Full serving path: ADC candidates per probed cell, then ONE exact
    * squared-L2 re-rank join against the distributed raw-vector table.
    * Output (qid, id, score, rank), rank <= k. */
  def search(index: RoutedPqIndex, queries: DataFrame, vectors: DataFrame,
             k: Int, nProbe: Int, candidates: Int, ef0: Int = 0): DataFrame = {
    val coarse = searchCoarse(index, queries, math.max(candidates, k),
      nProbe, ef0).select(col("qid"), col("id"))
    Pq.rerank(coarse, vectors, queries, k)
  }

  /** Tombstone delete on the PQ tier — O(set) handle metadata, sharing
    * the shards (the [[HnswRouted.delete]] semantics verbatim: serving
    * excludes the set transparently; deleting an ABSENT id is accepted
    * and delete-wins against later inserts of it). Folding the set out
    * has two paths: when a float source is live, compact IT and
    * [[rederive]] (re-encodes only touched cells); with no float
    * source (the attached posture), [[compactSolo]] rebuilds touched
    * cells from the raw-vector table. */
  def delete(index: RoutedPqIndex, ids: DataFrame): RoutedPqIndex =
    RoutedLifecycle.delete(PqTier)(index, ids)

  // --------------------------------------------------------------------
  // SOLO lifecycle — the attached tier without its float source.
  // [[attach]] restores graph + codes with no float index anywhere; the
  // lifecycle must not then require one. ingest quantizes-on-insert in
  // ADC space (the [[AdcVectorStore]] discipline: the new point's raw
  // float serves its own insertion beam, then drops to code precision
  // like every other member); compactSolo folds tombstones by
  // rebuilding ONLY touched cells from the raw-vector table (the
  // re-rank table — the one full-precision copy the design keeps).
  // --------------------------------------------------------------------

  private val tripleEnc = Encoders.tuple(
    Encoders.scalaLong, ExprEnc.floatArray, Encoders.scalaInt)

  /** Fingerprint of a solo-ingested cell: the true content fingerprint
    * needs the old members' floats, which the solo tier does not hold —
    * fold the new ids into the prior digest so the value can never
    * equal any float-source content fingerprint (same 2^-64 collision
    * class as the fingerprint itself). A later [[rederive]] against a
    * float source then re-encodes exactly the solo-touched cells. */
  private def ingestedFp(prior: Long, ids: Iterator[Long]): Long =
    ids.foldLeft(mix64(prior ^ 0x5851F42D4C957F2DL))((acc, id) =>
      acc + mix64(id * 0x9E3779B97F4A7C15L))

  /** Ingest a float batch into the PQ tier WITHOUT a float source — the
    * attached tier's grow path. Routing, guards and the cogroup merge
    * mirror [[HnswRouted.ingest]] verbatim (global duplicate-id guard,
    * tombstone fail-fast, untouched cells pass by reference); the
    * per-cell insert runs the unchanged HNSW kernel over
    * [[AdcVectorStore]] — the new point's raw float serves its own
    * insertion beam (asymmetric ADC against member codes), then
    * [[AdcVectorStore.insert]] QUANTIZES it: from that moment the point
    * is searchable at code precision exactly like every restored
    * member, in-session or after the next save/attach. The exact
    * re-rank join keeps end-to-end exactness wherever the raw-vector
    * table holds the batch (the caller appends it there).
    *
    * `seed` drives layer selection for the new nodes (hash(id, seed));
    * the default (Long.MinValue sentinel) is the index's persisted
    * [[RoutedPqIndex.buildSeed]] so solo-grown cells draw layers
    * exactly like a float-source build of the same rows would — an
    * explicit seed stays structurally valid (layer draws are
    * independent per node) but breaks graph-identity with the float
    * twin. Touched cells' fingerprints are INVALIDATED (see
    * [[ingestedFp]]): a later [[rederive]] against a float source
    * re-encodes them and restores true-content digests. */
  def ingest(index: RoutedPqIndex, newRows: DataFrame,
             persist: Boolean = true, unpersistPrior: Boolean = false,
             seed: Long = Long.MinValue): RoutedPqIndex = {
    val effSeed = if (seed == Long.MinValue) index.buildSeed else seed
    val router = index.router
    val spark = newRows.sparkSession
    val deduped = newRows.select(col("id"), col("vec"))
      .groupBy(col("id")).agg(max(col("vec")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchIds = deduped.select(col("id"))
        .as(Encoders.scalaLong).collect()
      java.util.Arrays.sort(batchIds)
      // shared fail-fast guards (RoutedLifecycle): tombstoned-id
      // resurrect + cross-cell duplicate-id scan
      RoutedLifecycle.guardResurrect(PqTier)(index, batchIds)
      RoutedLifecycle.guardClashes(PqTier)(index, batchIds)
      val part = index.shards.partitioner.getOrElse(
        HnswRouted.partitionerFor(router))
      val keyed = deduped
        .select(col("id"), col("vec"), router.cellCol(col("vec")).as("cell"))
        .as(tripleEnc).rdd
        .map { case (id, vec, cell) => (cell, (id, vec)) }
        .partitionBy(part)
      val params = index.params
      val cbB = spark.sparkContext.broadcast(index.codebook)
      val merged = index.shards.cogroup(keyed).mapPartitions({ it =>
        val searcher = new HnswSearcher(params)
        it.flatMap { case (cell, (shards, rows)) =>
          if (rows.isEmpty) shards.iterator.map(cell -> _)
          else {
            val cb = cbB.value
            val sorted = rows.toArray.sortBy(_._1)
            val prior = shards.headOption
            // copy-on-merge: the prior shard may still be cached —
            // never mutate it in place (the codes tier's discipline)
            val codeMap = prior match {
              case Some(p) => p.codes.copy(extra = sorted.length)
              case None    => new LongLongMap(sorted.length)
            }
            val graph = prior match {
              case Some(p) => graft.store.InMemoryGraph.fromSnapshot(p.snapshot)
              case None    => new graft.store.InMemoryGraph
            }
            val store = new AdcVectorStore(cb, base = codeMap(_))
            sorted.foreach { case (id, v) =>
              require(!codeMap.contains(id),
                s"routed-pq ingest: id $id already present in cell $cell")
              store.prepareQueryWithId(id, v)
              // searcher.insert runs the S10 kernel, whose vectors.insert
              // call QUANTIZES the staged point (AdcVectorStore contract):
              // from here on the id serves at code precision
              searcher.insert(store, graph, id,
                searcher.selectLayerByHash(id, effSeed))
              codeMap.put(id, PqKernels.encodeArray(v, cb))
            }
            Iterator(cell -> PqCellShard(cell, codeMap, graph.snapshot,
              ingestedFp(prior.map(_.fingerprint).getOrElse(0L),
                sorted.iterator.map(_._1))))
          }
        }
      }, preservesPartitioning = true)
      if (persist) {
        merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .setName("graft-hnsw-routed-pq")
        merged.count()
      }
      if (unpersistPrior) index.unpersist()
      index.copy(shards = merged)
    } finally deduped.unpersist(blocking = false)
  }

  /** Opt-in serving warm-up — [[HnswRouted.warm]] on the compressed
    * tier: one deserializing sweep of graph + code blocks off the
    * serving path (the attach posture's first-serve discipline).
    * Returns the shard count. */
  def warm(index: RoutedPqIndex): Long = RoutedOps.warm(index.shards)

  /** Covering-probe warm-up — [[HnswRouted.warmProbe]] on the
    * compressed tier: one member RECONSTRUCTION per cell served back
    * through the coarse ADC path at k = 1 (no float table — usable in
    * the solo/attached posture), paying the kernel JIT + plan warm-up
    * that [[warm]]'s block sweep leaves on the first real serve. The
    * exact re-rank join is deliberately not driven: it reads the
    * external raw-vector table, whose warmth is the table owner's
    * concern, not the index's. */
  def warmProbe(index: RoutedPqIndex, ef: Int = 16): Long = {
    val cbB = index.shards.sparkContext.broadcast(index.codebook)
    val reps = index.shards.flatMap { case (cell, s) =>
      // headOption stops at the first occupied slot — the probe-rep
      // collection is O(nCells) decodes, not a full code-map walk
      s.codes.headOption.iterator.map { case (_, c) =>
        (cell.toLong, PqKernels.decodeArray(c, cbB.value))
      }
    }.collect()
    if (reps.isEmpty) 0L
    else {
      val spark = SparkSession.active
      import spark.implicits._
      val qDf = reps.toSeq.toDF("qid", "qvec")
      searchCoarse(index, qDf, candidates = math.max(1, ef), nProbe = 1,
        ef0 = ef).count()
      reps.length.toLong
    }
  }

  /** Which of `ids` are present in the index's code maps — one narrow
    * scan of the shard key sets (no shuffle; the [[HnswRouted
    * .presentIds]] contract on the compressed tier). Sorted. */
  def presentIds(index: RoutedPqIndex, ids: Array[Long]): Array[Long] =
    RoutedOps.presentIds(index.shards, ids)(
      (s, f) => s.codes.foreach((id, _) => f(id)))

  /** (cell, rows) occupancy — the threshold-compaction stat. */
  private[graft] def cellStats(index: RoutedPqIndex): Array[(Int, Long)] =
    RoutedOps.cellStats(index.shards)(_.codes.size)

  /** Fold the deletion set out of the PQ tier WITHOUT a float source:
    * cells holding a tombstoned id rebuild from the raw-vector table
    * (survivor floats fetched for ONLY the touched cells — one join
    * against the table the exact re-rank already reads), getting a
    * float-exact fresh graph, re-encoded codes and a TRUE content
    * fingerprint back; untouched cells pass through by reference.
    * Tombstones empty (every present dead id was folded; absent ids
    * were no-ops), freeing the ids for re-ingest. Cost: O(touched
    * cells) graph build + one scan/shuffle of the raw-vector table
    * restricted to touched-cell survivors — the solo twin of the
    * float tier's compact, with the vector fetch made explicit. */
  def compactSolo(index: RoutedPqIndex, vectors: DataFrame,
                  persist: Boolean = true,
                  unpersistPrior: Boolean = false,
                  floatExact: Boolean = true): RoutedPqIndex =
    compactSoloCounted(index, vectors, persist, unpersistPrior,
      forceCount = false, floatExact = floatExact)._1

  /** [[compactSolo]] exposing (index, rebuiltCells, carriedCells).
    * `floatExact` follows [[compactSoloCells]]: false rebuilds touched
    * cells with the [[buildSolo]] kernel over the same fetched floats
    * (the serving-cadence choice — solo build-serve geometry, 7x
    * cheaper rebuild; BASELINE round-18). */
  private[graft] def compactSoloCounted(
      index: RoutedPqIndex, vectors: DataFrame,
      persist: Boolean = true, unpersistPrior: Boolean = false,
      forceCount: Boolean = true,
      floatExact: Boolean = true): (RoutedPqIndex, Long, Long) = {
    if (index.tombstones.isEmpty) return (index, 0L, index.router.allCells.size.toLong)
    val spark = vectors.sparkSession
    val sc = spark.sparkContext
    val deadB = sc.broadcast(index.tombstones)
    val part = index.shards.partitioner.getOrElse(
      HnswRouted.partitionerFor(index.router))
    // survivor ids of TOUCHED cells only — each carries its cell so the
    // fetched floats shuffle straight back to the pinned partition
    val survivorIds = index.shards.flatMap { case (cell, s) =>
      val dead = deadB.value
      if (!dead.exists(s.codes.contains)) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        s.codes.foreach { (id, _) =>
          if (java.util.Arrays.binarySearch(dead, id) < 0) out += ((id, cell))
        }
        out.iterator
      }
    }
    import spark.implicits._
    val fetched = survivorIds.toDF("id", "cell")
      .join(vectors.select(col("id"), col("vec")), Seq("id"))
      .select(col("id"), col("vec"), col("cell"))
      .as(tripleEnc).rdd
      .map { case (id, vec, cell) => (cell, (id, vec)) }
      .partitionBy(part)
    val params = index.params
    val buildSeed = index.buildSeed
    val cbB = sc.broadcast(index.codebook)
    val rebuilt = sc.longAccumulator("pq-compact-solo-rebuilt")
    val carried = sc.longAccumulator("pq-compact-solo-carried")
    val merged = index.shards.cogroup(fetched).mapPartitions({ it =>
      it.flatMap { case (cell, (shards, rows)) =>
        shards.headOption match {
          case None => Iterator.empty
          case Some(p) =>
            val dead = deadB.value
            if (!dead.exists(p.codes.contains)) {
              carried.add(1)
              Iterator(cell -> p)
            } else {
              rebuilt.add(1)
              val survivors = rows.toArray.sortBy(_._1)
              require(survivors.length == p.codes.size - dead.count(p.codes.contains),
                s"routed-pq compactSolo: cell $cell fetched ${survivors.length} " +
                  s"survivor vectors but the shard holds " +
                  s"${p.codes.size - dead.count(p.codes.contains)} — the " +
                  "raw-vector table is missing rows the index serves")
              if (floatExact) {
                val cfg = HnswDistributed.BuildConfig(params, "l2",
                  seed = buildSeed)
                val fresh = HnswRouted.buildCellFresh(cell, survivors, cfg)
                Iterator(cell -> encodeShard(fresh, cbB.value))
              } else
                Iterator(cell -> buildCellSolo(cell, survivors, cbB.value,
                  params, buildSeed))
            }
        }
      }
    }, preservesPartitioning = true)
    if (persist) {
      merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-routed-pq")
      merged.count()
    } else if (forceCount) merged.count()
    if (unpersistPrior) index.unpersist()
    // carry the prior handle's patch overlays unless unpersist()
    // already released them: the merged composite reads (or read)
    // through them, and a caller that drops the prior reference after
    // `idx = compactSolo(idx, ...)` must still be able to release the
    // cached patch blocks via the NEW handle's unpersist()/foldOverlay
    (RoutedPqIndex(index.params, index.router, index.codebook, merged,
      Array.empty[Long], index.buildSeed,
      overlay = if (unpersistPrior) Nil else index.overlay),
      rebuilt.value, carried.value)
  }

  // --------------------------------------------------------------------
  // Merged-cell detection + targeted remedy — the float/codes tiers'
  // audit on the COMPRESSED tier, the last one unguarded against the
  // dead-side serving tax (float measured 11.6x, codes 7.0x from ONE
  // merged cell). The census runs over code RECONSTRUCTIONS
  // ([[PqKernels.decodeArray]] — 16 centroid lookups per member), so a
  // solo-built index whose floats live only on disk audits WITHOUT
  // touching the float source; the remedy (a targeted rebuild) is the
  // one step that genuinely needs survivor floats, and it fetches them
  // for ONLY the flagged cells through the same join the exact re-rank
  // already uses.
  // --------------------------------------------------------------------

  /** Merged-cell audit — [[HnswRouted.mergedCellAudit]] on the
    * compressed representation: cells in the suspicious dead-fraction
    * band decode their codes to reconstructions and run the SHARED
    * float-space separability kernel ([[MergedCellAudit.auditCell]]).
    * Quantization cannot hide the structure the audit hunts: dead/live
    * mode separation is orders of magnitude above the codebook's
    * quantization radius, and members of one mode reconstruct into the
    * same small centroid neighborhood. Schema and thresholds identical
    * to the float/codes audits. Remedy: [[compactSoloCells]] /
    * [[compactSoloCellsPatched]] on the flagged ids. */
  def mergedCellAudit(index: RoutedPqIndex, minCellRows: Int = 1024,
                      minDeadBp: Int = 1000, maxDeadBp: Int = 9000,
                      sampleMax: Int = 4096, iters: Int = 8,
                      kSplit: Int = 8): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val tombB = index.shards.sparkContext.broadcast(index.tombstones)
    val cbB = index.shards.sparkContext.broadcast(index.codebook)
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
          val cb = cbB.value
          val buf = new scala.collection.mutable.ArrayBuffer[(Long, Array[Float])](cellN)
          s.codes.foreach { (id, c) => buf += ((id, PqKernels.decodeArray(c, cb))) }
          val all = buf.toArray.sortBy(_._1)
          val (hiBp, loBp, massHiBp, merged) = MergedCellAudit.auditCell(
            all, graft.store.Metrics.byName("l2"), isDead, nDead,
            sampleMax, iters, kSplit)
          Iterator.single((cell, cellN.toLong, nDead.toLong, deadBp,
            hiBp, loBp, massHiBp, merged))
        }
      }
    }.collect()
    rows.toSeq.toDF("cell", "n", "n_dead", "dead_bp",
      "hi_dead_bp", "lo_dead_bp", "dead_mass_hi_bp", "merged")
  }

  /** Targeted solo compaction: [[compactSolo]] restricted to the listed
    * cells — fold the deletion set out of ONLY those cells (survivor
    * floats fetched for only them), SHRINK the tombstone set by exactly
    * the ids that lived there, pass every other cell by reference.
    *
    * `floatExact = false` rebuilds the listed cells with the
    * [[buildSolo]] kernel instead: the SAME survivor-float fetch join,
    * but each survivor's RAW float drives its own insertion beam in
    * ADC space (asymmetric — raw query against member codes), so the
    * rebuilt cell is graph-identical to a fresh solo build of the same
    * survivors. Why offer it: the float-exact rebuild's graph is built
    * on exact distances, which yields a DENSER effective adjacency
    * than the ADC-built neighbors around it, and the ADC beam pays for
    * that density on every post-remedy serve (~0.25 ms/query at 1e7 —
    * BASELINE round-17's four-run attribution); this variant restores
    * the exact build-serve geometry the rest of the solo index has.
    * Served EXACTNESS is unchanged either way (the exact re-rank
    * orders true candidates). NOTE a float-FREE variant (staging code
    * RECONSTRUCTIONS instead of fetched floats) was built and measured
    * in round 18 and REJECTED: all members of one PQ Voronoi region
    * decode to the same point, so the rebuilt graph degenerates into
    * zero-distance cliques and every query escalates to the exact
    * scan — post-remedy serving read 7.6x plain at 1e6, WORSE than the
    * unremediated tax (BASELINE round-18). The fetch join is the price
    * of a servable graph. */
  def compactSoloCells(index: RoutedPqIndex, vectors: DataFrame,
                       cells: Array[Int], persist: Boolean = true,
                       unpersistPrior: Boolean = false,
                       floatExact: Boolean = true): RoutedPqIndex =
    if (cells.isEmpty || index.tombstones.isEmpty) index
    else {
      val (merged, removed) =
        rebuildCellsSolo(index, vectors, cells, touchedOnly = false,
          floatExact = floatExact)
      if (persist) {
        merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .setName("graft-hnsw-routed-pq")
        merged.count()
        if (unpersistPrior) index.unpersist()
      }
      val remaining = index.tombstones.filter(id =>
        java.util.Arrays.binarySearch(removed, id) < 0)
      // same overlay carry as compactSoloCounted: a prior patched
      // handle's overlay RDDs stay releasable through this handle
      RoutedPqIndex(index.params, index.router, index.codebook, merged,
        remaining, index.buildSeed,
        overlay = if (persist && unpersistPrior) Nil else index.overlay)
    }

  /** [[compactSoloCells]] with O(touched) PERSISTED BYTES — the
    * float/codes tiers' patch-overlay discipline on the compressed
    * tier: only the touched partitions' cells persist in the overlay;
    * the served composite reads the base's cached blocks everywhere
    * else; the base handle keeps serving its own answer; patches
    * stack, [[foldOverlay]] bounds the stack. */
  def compactSoloCellsPatched(index: RoutedPqIndex, vectors: DataFrame,
                              cells: Array[Int],
                              persist: Boolean = true,
                              floatExact: Boolean = true): RoutedPqIndex =
    if (cells.isEmpty || index.tombstones.isEmpty) index
    else {
      val (overlay, removed) =
        rebuildCellsSolo(index, vectors, cells, touchedOnly = true,
          floatExact = floatExact)
      if (persist) {
        overlay.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .setName("graft-hnsw-routed-pq-patch")
        overlay.count()
      }
      val patched = RoutedLifecycle.patchComposite(index.shards, overlay)
      val remaining = index.tombstones.filter(id =>
        java.util.Arrays.binarySearch(removed, id) < 0)
      // the overlay is tracked in the handle even with persist = false
      // (unpersist of a never-persisted RDD is a no-op, and foldOverlay
      // must still know a patch layer exists to fold). NOTE: with
      // persist = false every action on the patched composite re-runs
      // the survivor-float fetch join and the flagged cells' rebuild —
      // acceptable only as a one-shot; serve-many callers want
      // persist = true or an immediate foldOverlay.
      RoutedPqIndex(index.params, index.router, index.codebook, patched,
        remaining, index.buildSeed,
        overlay = index.overlay :+ overlay)
    }

  /** Shared rebuild pass of the two targeted solo compactions: fetch
    * survivor floats for ONLY the listed cells, rebuild those cells
    * fresh (float-exact graph + re-encoded codes + true content
    * fingerprint). `touchedOnly = true` yields the patch overlay
    * (untouched PARTITIONS empty); `false` yields the full composite
    * (untouched cells pass by reference). Also returns the sorted
    * tombstoned ids that lived in the listed cells. */
  private def rebuildCellsSolo(index: RoutedPqIndex, vectors: DataFrame,
                               cells: Array[Int], touchedOnly: Boolean,
                               floatExact: Boolean = true)
      : (org.apache.spark.rdd.RDD[(Int, PqCellShard)], Array[Long]) = {
    val spark = vectors.sparkSession
    val sc = spark.sparkContext
    val params = index.params
    val cellSet = cells.toSet
    val deadB = sc.broadcast(index.tombstones)
    val part = index.shards.partitioner.getOrElse(
      HnswRouted.partitionerFor(index.router))
    val touchedParts = cells.map(part.getPartition(_: Any)).toSet
    val removed = RoutedLifecycle.collectRemoved(PqTier)(index, cells)
    // prunedShards, like the `removed` pass above: a 1-cell remedy at
    // 1e8 schedules one partition's task, not a deserializing sweep of
    // every cached block
    val survivorIds = HnswRouted.prunedShards(index.shards, cells)
      .flatMap { case (cell, s) =>
        if (!cellSet(cell)) Iterator.empty
        else {
          val dead = deadB.value
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
          s.codes.foreach { (id, _) =>
            if (java.util.Arrays.binarySearch(dead, id) < 0) out += ((id, cell))
          }
          out.iterator
        }
      }
    import spark.implicits._
    val fetched = survivorIds.toDF("id", "cell")
      .join(vectors.select(col("id"), col("vec")), Seq("id"))
      .select(col("id"), col("vec"), col("cell"))
      .as(tripleEnc).rdd
      .map { case (id, vec, cell) => (cell, (id, vec)) }
      .partitionBy(part)
    val cbB = sc.broadcast(index.codebook)
    val seed = index.buildSeed
    val rebuilt = index.shards.cogroup(fetched).mapPartitionsWithIndex({ (i, it) =>
      if (touchedOnly && !touchedParts(i)) Iterator.empty
      else it.flatMap { case (cell, (shards, rows)) =>
        shards.headOption.map { p =>
          if (!cellSet(cell)) cell -> p
          else {
            val dead = deadB.value
            val survivors = rows.toArray.sortBy(_._1)
            require(survivors.length == p.codes.size - dead.count(p.codes.contains),
              s"routed-pq targeted compact: cell $cell fetched " +
                s"${survivors.length} survivor vectors but the shard holds " +
                s"${p.codes.size - dead.count(p.codes.contains)} — the " +
                "raw-vector table is missing rows the index serves")
            if (floatExact) {
              val cfg = HnswDistributed.BuildConfig(params, "l2", seed = seed)
              cell -> encodeShard(HnswRouted.buildCellFresh(cell, survivors, cfg),
                cbB.value)
            } else
              // the buildSolo kernel: graph-identical to a fresh solo
              // build of these survivors (same sort, same seed, same
              // codebook) — the post-remedy serve-geometry parity path
              cell -> buildCellSolo(cell, survivors, cbB.value, params, seed)
          }
        }
      }
    }, preservesPartitioning = true)
    (rebuilt, removed)
  }

  /** One cell's [[buildSolo]] kernel over pre-sorted unique (id, vec)
    * rows: ADC-space insertion with the RAW float staged (asymmetric —
    * the new point's float serves its own beam against member codes,
    * then drops to code precision), codes + TRUE content fingerprint.
    * Shared by [[buildSolo]] and the `floatExact = false` targeted
    * rebuild, so a remediated cell is graph-identical to a fresh solo
    * build of the same survivors. */
  private def buildCellSolo(cell: Int, rows: Array[(Long, Array[Float])],
                            cb: Array[Array[Array[Float]]],
                            params: HnswParams, seed: Long): PqCellShard = {
    val codeMap = new LongLongMap(rows.length)
    val graph = new graft.store.InMemoryGraph
    val store = new AdcVectorStore(cb, base = codeMap(_))
    val searcher = new HnswSearcher(params)
    rows.foreach { case (id, v) =>
      store.prepareQueryWithId(id, v)
      searcher.insert(store, graph, id,
        searcher.selectLayerByHash(id, seed))
      codeMap.put(id, PqKernels.encodeArray(v, cb))
    }
    PqCellShard(cell, codeMap, graph.snapshot,
      contentFingerprintRows(rows.iterator))
  }

  /** Fold stacked patch overlays into one self-contained persisted
    * image — [[HnswRoutedCodes.foldOverlay]] on the compressed tier. */
  def foldOverlay(index: RoutedPqIndex,
                  storage: org.apache.spark.storage.StorageLevel =
                    org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): RoutedPqIndex =
    RoutedLifecycle.foldOverlay(PqTier)(index, storage)

  /** Detect-and-remediate — [[HnswRouted.remediateMergedCells]] on the
    * compressed tier: [[mergedCellAudit]] (over reconstructions — no
    * float access) → targeted solo compaction of the flagged cells
    * (survivor floats fetched for only them), PATCHED by default.
    * Returns the remediated index (the input handle when nothing is
    * flagged) and the flagged cell ids. */
  def remediateMergedCellsSolo(index: RoutedPqIndex, vectors: DataFrame,
                               minCellRows: Int = 1024,
                               persist: Boolean = true,
                               unpersistPrior: Boolean = false,
                               patched: Boolean = true,
                               floatExact: Boolean = true): (RoutedPqIndex, Array[Int]) = {
    val flagged = mergedCellAudit(index, minCellRows)
      .filter(col("merged")).select(col("cell"))
      .collect().map(_.getInt(0))
    if (flagged.isEmpty) (index, flagged)
    else if (patched)
      (compactSoloCellsPatched(index, vectors, flagged, persist,
        floatExact), flagged)
    else
      (compactSoloCells(index, vectors, flagged, persist, unpersistPrior,
        floatExact), flagged)
  }

  /** Follow the float source tier through its lifecycle: after
    * [[HnswRouted.ingest]]/[[HnswRouted.compact]]/compactCells[Patched]/
    * foldOverlay/[[HnswRouted.retrain]] on the source, re-derive the PQ
    * serving tier INCREMENTALLY — cells whose content fingerprint is
    * unchanged carry their codes over by reference (zero encode work;
    * they do adopt the source's current graph snapshot, so a
    * graph-identical rebuild is also free), and only content-changed
    * cells re-encode. The codebook is NEVER retrained here (it
    * quantizes content, and lifecycle ops move rows between graphs —
    * [[HnswRouted.driftAudit]] + a fresh [[fromRouted]] is the refresh
    * path when ingest drift degrades it). Tombstones adopt the
    * source's set — after a source compact they shrink to exactly what
    * the fold left.
    *
    * When the source's cell layout changed (retrain → new router, or a
    * re-attach with a different partitioner), CELL-keyed carry is
    * impossible — but CONTENT-keyed carry is not: a retrain that moved
    * few members re-converges most cells onto identical member sets
    * under new cell ids. The cross-layout path matches old cells to
    * new cells BY content fingerprint (one cheap digest pass over the
    * source — no encode), ships only the matched cells' code maps
    * through the new partitioner (a shuffle bounded by the carried
    * code bytes, 8 B/row), and re-encodes just the unmatched cells.
    * Solo-ingested cells can never false-match ([[ingestedFp]] keeps
    * their digests outside the content-digest family).
    *
    * `unpersistPrior` releases the old PQ handle's shards once the new
    * image is materialized (set it in streaming loops that own their
    * handles; leave it off when `old` is a shared memo). */
  def rederive(old: RoutedPqIndex, source: HnswRouted.RoutedIndex,
               persist: Boolean = true,
               unpersistPrior: Boolean = false): RoutedPqIndex =
    rederiveCounted(old, source, persist, unpersistPrior,
      forceCount = false)._1

  /** [[rederive]] exposing (index, reencodedCells, carriedCells) — the
    * counters ride accumulators, so with `persist = false` this forces
    * one count() job to populate them (spec/instrumentation path). */
  private[graft] def rederiveCounted(
      old: RoutedPqIndex, source: HnswRouted.RoutedIndex,
      persist: Boolean = true,
      unpersistPrior: Boolean = false,
      forceCount: Boolean = true): (RoutedPqIndex, Long, Long) = {
    require(source.cfg.metric == "l2",
      s"HnswRoutedPq serves squared-L2 (ADC); routed graphs were built " +
        s"with ${source.cfg.metric}")
    val sc = source.shards.sparkContext
    val samePartitioning = (source.shards.partitioner, old.shards.partitioner) match {
      case (Some(a), Some(b)) => a == b // CellPartitioner: value equality
      case _                  => false
    }
    if (!samePartitioning) {
      // layout changed (retrain / foreign attach): carry BY CONTENT
      // FINGERPRINT across the layouts (see the Scaladoc). Driver
      // state is one (fingerprint, cell) pair per cell on each side —
      // nCells-sized, never corpus-sized.
      val oldFps = old.shards.map { case (c, s) => (s.fingerprint, c) }
        .collect().toMap // fp collision across cells: content-distinct
                         // cells (ids partition) — 2^-64 class
      val srcFps = source.shards.map { case (c, s) =>
        (c, contentFingerprint(s.vectors), s.vectors.size)
      }.collect()
      val carryByNewCell = srcFps.flatMap { case (nc, fp, _) =>
        oldFps.get(fp).map(oc => (oc, nc))
      }
      if (carryByNewCell.isEmpty) {
        val v = fromRoutedWith(source, old.codebook, persist)
        if (unpersistPrior) old.unpersist()
        (v, source.router.allCells.size.toLong, 0L)
      } else {
        val part = source.shards.partitioner.getOrElse(
          HnswRouted.partitionerFor(source.router))
        val carryMapB = sc.broadcast(carryByNewCell.toMap) // oldCell -> newCell
        // ship matched cells' code maps keyed by the NEW cell id (the
        // only shuffle; 8 B/row code bytes of carried cells)
        val shipped = old.shards.flatMap { case (oc, s) =>
          carryMapB.value.get(oc).map(nc => (nc, s.codes))
        }.partitionBy(part)
        val cbB = sc.broadcast(old.codebook)
        val reenc = sc.longAccumulator("pq-rederive-reencoded")
        val carry = sc.longAccumulator("pq-rederive-carried")
        val shards = source.shards.zipPartitions(shipped,
            preservesPartitioning = true) { (fIt, cIt) =>
          val carried = cIt.toMap
          fIt.map { case (cell, s) =>
            carried.get(cell) match {
              case Some(codes) if codes.size == s.vectors.size =>
                carry.add(1)
                // codes by reference; the new layout's graph + a TRUE
                // content digest (the match condition IS that digest)
                cell -> PqCellShard(cell, codes, s.snapshot,
                  contentFingerprint(s.vectors))
              case _ =>
                reenc.add(1)
                cell -> encodeShard(s, cbB.value)
            }
          }
        }
        if (persist) {
          shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            .setName("graft-hnsw-routed-pq")
          shards.count()
        } else if (forceCount) shards.count()
        if (unpersistPrior) old.unpersist()
        (RoutedPqIndex(source.cfg.params, source.router, old.codebook, shards,
          source.tombstones, buildSeed = source.cfg.seed),
          reenc.value, carry.value)
      }
    } else {
      val cbB = sc.broadcast(old.codebook)
      val reenc = sc.longAccumulator("pq-rederive-reencoded")
      val carry = sc.longAccumulator("pq-rederive-carried")
      val shards = source.shards.zipPartitions(old.shards,
          preservesPartitioning = true) { (fIt, pIt) =>
        val prior = pIt.map(kv => kv._1 -> kv._2).toMap
        fIt.map { case (cell, s) =>
          val fp = contentFingerprint(s.vectors)
          prior.get(cell) match {
            case Some(p) if p.fingerprint == fp &&
                p.codes.size == s.vectors.size =>
              carry.add(1)
              // codes by reference; snapshot follows the source (free —
              // content-identical cells rebuild graph-identically)
              cell -> PqCellShard(cell, p.codes, s.snapshot, fp)
            case _ =>
              reenc.add(1)
              cell -> encodeShard(s, cbB.value)
          }
        }
      }
      if (persist) {
        shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .setName("graft-hnsw-routed-pq")
        shards.count()
      } else if (forceCount) shards.count() // populate the accumulators
      if (unpersistPrior) old.unpersist()
      (RoutedPqIndex(source.cfg.params, source.router, old.codebook, shards,
        source.tombstones, buildSeed = source.cfg.seed), reenc.value, carry.value)
    }
  }

  // --------------------------------------------------------------------
  // Durability: versioned parquet persistence + attach-without-rederive.
  // The 1e8 serving posture NEEDS this: deriving the PQ tier requires
  // the float source resident, so a restart that re-derives would pay
  // the full float build + encode — attach pays a parquet scan + CSR
  // assembly instead, and the float source never has to exist on the
  // serving cluster at all (graph + codes restore directly; raw
  // vectors stay wherever the re-rank join reads them from).
  // --------------------------------------------------------------------


  /** Persist the PQ tier under `path` as a new complete version (the
    * [[VersionedIndexDirs]] discipline shared with the float/codes
    * tiers: `_DONE`-marked last, readers only ever see complete
    * versions). Eight tables: meta (params + router arity), centroids
    * (both router levels), codebook (the global PQ codebook), codes
    * (8 B/row per cell), links (per-cell CSR rows), entries,
    * fingerprints (per-cell content digests — [[rederive]] keeps its
    * incremental carry across a restart), tombstones (the live
    * deletion set). The metric is structurally `l2` (the
    * [[fromRouted]] requirement) so no metric column is stored. */
  def save(index: RoutedPqIndex, path: String, keepVersions: Int = 1): Unit =
    saveWith(SparkSession.active, index, path, keepVersions)

  private def saveWith(spark: SparkSession, index: RoutedPqIndex,
                       path: String, keepVersions: Int = 1): Unit = {
    import spark.implicits._
    val dir = VersionedIndexDirs.nextDir(spark, path)
    val p = index.params

    Seq((p.m.toSeq, p.mMax.toSeq, p.efConstrSearch.toSeq,
        p.efConstrInsert.toSeq, p.efSearch.toSeq, p.layerProbability,
        index.router.nPrimary, index.buildSeed))
      .toDF("m", "m_max", "ef_constr_search", "ef_constr_insert",
        "ef_search", "layer_probability", "n_primary", "build_seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")

    RoutedImage.writeRouter(spark, dir, index.router)

    index.codebook.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }.toSeq.toDF("sub", "idx", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")

    spark.createDataset(index.shards.flatMap { case (cell, s) =>
      s.codes.toSeq.iterator.map { case (id, code) => (cell, id, code) }
    })(RoutedImage.codeRowEnc).toDF("cell", "id", "code")
      .write.mode("overwrite").parquet(s"$dir/codes")

    RoutedImage.writeGraph(spark, dir, index.shards,
      (s: PqCellShard) => s.snapshot)

    spark.createDataset(index.shards.map { case (cell, s) =>
      (cell, s.fingerprint)
    })(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .toDF("cell", "fingerprint")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/fingerprints")

    RoutedImage.writeTombstones(spark, dir, index.tombstones)

    VersionedIndexDirs.commit(spark, path, dir, keepVersions)
  }

  /** Restore a saved PQ tier WITHOUT the float source: read the newest
    * complete version, reassemble per-cell shards with one
    * co-partitioned cogroup keyed by the pinned [[HnswRouted
    * .CellPartitioner]] (value-equal to the source index's, so a later
    * [[rederive]] against a re-attached float source still carries
    * unchanged cells by fingerprint). Attach cost is a parquet scan +
    * CSR assembly — no k-means, no HNSW construction, no encode. */
  def attach(spark: SparkSession, path: String,
             persist: Boolean = true,
             storage: org.apache.spark.storage.StorageLevel =
               org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): RoutedPqIndex = {
    val dir = VersionedIndexDirs.newestDone(spark, path)

    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val params = RoutedImage.paramsFromMeta(meta)
    // build_seed persists since round 16; older images fall back to the
    // historical hardcoded solo seed (13) they were operated with
    val buildSeed =
      if (meta.schema.fieldNames.contains("build_seed"))
        meta.getAs[Long]("build_seed")
      else 13L
    val router = RoutedImage.readRouter(spark, dir, "l2")
    val codebook = spark.read.parquet(s"$dir/codebook").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[Seq[Float]](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3) }
    val fps = spark.read.parquet(s"$dir/fingerprints").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val fpB = spark.sparkContext.broadcast(fps)

    val part = HnswRouted.partitionerFor(router)
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("cell"), col("id"), col("code")).as(RoutedImage.codeRowEnc).rdd
      .map { case (c, id, code) => (c, (id, code)) }
    val links = RoutedImage.readLinks(spark, dir)
    val entries = RoutedImage.readEntries(spark, dir)
    // per-cell PRESENCE rides the fingerprints table (one row per
    // SHARD, zero-code cells included): without it the cogroup below
    // silently drops cells whose shard held no codes — a fully-deleted-
    // then-compacted cell would not survive the round-trip, a later
    // rederive would count it as a re-encode, and cellStats-based
    // thresholds would see fewer cells than the saved index had
    val presence = spark.sparkContext
      .parallelize(fps.keys.toSeq.map(c => (c, ())), math.max(1, part.numPartitions))

    val shards = codes.cogroup(links, entries, presence, part)
      .mapPartitions({ it =>
      it.flatMap { case (cell, (cs, ls, es, ps)) =>
        if (cs.isEmpty && ps.isEmpty) Iterator.empty // defensive: unknown cell
        else Iterator.single(cell -> PqCellShard(cell,
          LongLongMap.from(cs.iterator, 64),
          RoutedImage.assembleSnapshot(ls, es),
          fpB.value.getOrElse(cell, 0L)))
      }
    }, preservesPartitioning = true)
    if (persist) {
      shards.persist(storage).setName("graft-hnsw-routed-pq")
      shards.count()
    }
    RoutedPqIndex(params, router, codebook, shards,
      RoutedImage.readTombstones(spark, dir), buildSeed)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, RoutedPqIndex]()

  /** Release the memo (see [[IndexCaches]]). */
  private[hnsw] def releaseCaches(): Unit = {
    cache.values.forEach(_.unpersist())
    cache.clear()
  }

  /** Memoized save→attach round-trip over the cached derivation — the
    * catalog's durable-path handle (the [[HnswRouted.attachCached]]
    * pattern): derive once, persist the eight-table image, restore it
    * WITHOUT the float source, serve from the attached copy. */
  def attachCached(index: HnswRouted.RoutedIndex, key: String): RoutedPqIndex = {
    val spark = SparkSession.active
    val full = s"${index.shards.sparkContext.applicationId}|pqattach|$key"
    val hit = cache.get(full)
    if (hit != null) hit
    else {
      val v = graft.BuildLedger.timed("hnsw_routed_pq_save_attach") {
        val derived = fromRoutedCached(index, key)
        val dir = graft.TempDirs.create("graft_routed_pq_")
        saveWith(spark, derived, dir)
        attach(spark, dir)
      }
      val prev = cache.putIfAbsent(full, v)
      if (prev != null) { v.unpersist(); prev } else v
    }
  }

  /** Memoized [[buildSolo]] — the catalog handle for the float-free
    * build path (one build per session per key). */
  def buildSoloCached(vectors: DataFrame, cfg: HnswDistributed.BuildConfig,
                      nCells: Int, key: String): RoutedPqIndex = {
    val spark = vectors.sparkSession
    val full = s"${spark.sparkContext.applicationId}|pqsolobuild|$key|$nCells"
    val hit = cache.get(full)
    if (hit != null) hit
    else {
      val v = graft.BuildLedger.timed("hnsw_routed_pq_solo_build")(
        buildSolo(vectors, cfg, nCells))
      val prev = cache.putIfAbsent(full, v)
      if (prev != null) { v.unpersist(); prev } else v
    }
  }

  /** Memoized derivation (nest-safe get/putIfAbsent — the source index
    * comes from [[HnswRouted.buildCached]], which may build inside this
    * call). Keyed by app id like every RDD-bearing memo. */
  def fromRoutedCached(index: HnswRouted.RoutedIndex, key: String,
                       seed: Long = 13L): RoutedPqIndex = {
    val full = s"${index.shards.sparkContext.applicationId}|pq|$key|$seed|" +
      s"${index.tombstones.length}"
    val hit = cache.get(full)
    if (hit != null) hit
    else {
      val v = graft.BuildLedger.timed("hnsw_routed_pq_encode")(fromRouted(index, seed))
      val prev = cache.putIfAbsent(full, v)
      if (prev != null) { v.unpersist(); prev } else v
    }
  }
}
