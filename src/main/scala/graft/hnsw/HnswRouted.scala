package graft.hnsw

import org.apache.spark.Partitioner
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.Ivf
import graft.store.{ArrayVectorStore, EntryPoint, GraphSnapshot, InMemoryGraph, LayerCsr, Metrics}

/** IVF-routed sharded HNSW — the two-level ANN serving architecture
  * (FAISS's IVF+graph composition, re-expressed Spark-first): a coarse
  * k-means quantizer partitions the vector space into cells, each cell
  * holds its OWN independent HNSW graph executor-side, and a query
  * searches only its `nProbe` nearest cells.
  *
  * Why this beats random sharding at scale: [[HnswDistributed.buildSharded]]
  * must fan every query out to EVERY shard (a random shard holds no
  * spatial claim, so none can be skipped) — per-query work is
  * shards × O(log(n/shards)). Here the router prunes the fan-out to
  * nProbe cells, so adding cells GROWS the cluster without growing the
  * per-query cost: at 1000 executors / 4096 cells / nProbe=32, each
  * query touches <1% of the fleet. The price is recall at cell
  * boundaries (a true neighbor can live in an unprobed cell) — measured
  * honestly by the `h_recall_routed` catalog row; `nProbe = nCells`
  * degrades to exactly the sharded exhaustive regime and is held to the
  * full hash oracle (`h_knn_routed`, the Ivf.search discipline).
  *
  * Build: one Ivf.train (driver sample), one assignment scan (codegen'd
  * ivf_cell — no UDF), a cell histogram (the skew guard — see
  * [[Router]]), ONE shuffle on the cell id, then per-cell sequential
  * HNSW construction inside mapPartitions — no driver round-trips, no
  * cross-cell traffic. Shards are KEYED by cell with a pinned
  * [[CellPartitioner]], so [[ingest]] routes a new batch to its cells
  * with a narrow dependency on the (possibly enormous) index side —
  * only the batch shuffles.
  *
  * Durability ([[save]]/[[attach]]): the index persists as six parquet
  * tables under ParquetGraphStore's versioned-directory discipline
  * (complete versions only, `_DONE`-marked, older versions reclaimed),
  * and `attach` restores it with one co-partitioned read — no k-means,
  * no graph construction. The designated 1e7+ serving tier no longer
  * costs its full build per session.
  */
object HnswRouted {

  /** One cell's shard: its id, vectors, and private graph. `vectors` is
    * the primitive [[LongVecMap]], NOT a scala map: shards persist at
    * MEMORY_AND_DISK, and under eviction they Kryo-round-trip through
    * disk — the exact trigger that deserialized a scala
    * `mutable.LongMap` corrupt and SIGSEGV'd the PQ tier (see
    * [[LongVecMap]]'s scaladoc; pinned by KryoRoundTripSpec). */
  final case class CellShard(
      cell: Int,
      vectors: LongVecMap,
      snapshot: GraphSnapshot
  ) extends Serializable

  /** Max secondary cells per split primary cell; also the stride of the
    * composite cell id (global = primary * SubCellCap + sub). */
  val SubCellCap = 4096

  /** Per-cell row budget before the skew guard splits (or refuses):
    * ~4M dim-64 float rows ≈ 1 GiB of vectors + a comparable graph per
    * cell — safely under the Kryo 2 GiB per-object wall and a
    * reasonable executor-memory slice. */
  val DefaultMaxCellRows = 4000000L

  /** The two-level quantizer: a primary k-means router plus a secondary
    * quantizer for each primary cell the skew guard split. k-means
    * cells on real corpora are SKEWED (the 1e7 rehearsal packed 156k
    * near-duplicates into one cell); an unsplit dense cell must fit one
    * executor's memory with no spill path, so cells above the row
    * budget are recursively refined instead of materialized whole. */
  final case class Router(primary: Ivf.IvfModel,
                          sub: Map[Int, Ivf.IvfModel]) extends Serializable {
    def nPrimary: Int = primary.nCells

    /** Global cell ids, enumerated (split parents contribute their
      * children, never themselves). */
    def allCells: Seq[Int] =
      (0 until nPrimary).flatMap { p =>
        sub.get(p) match {
          case Some(m) => (0 until m.nCells).map(s => p * SubCellCap + s)
          case None    => Seq(p * SubCellCap)
        }
      }

    /** Assignment column from a precomputed primary-cell column: the
      * common path recomputes nothing for unsplit parents; each split
      * parent adds one conditional secondary ivf_cell evaluation. */
    def cellColFrom(vecCol: Column, pcellCol: Column): Column =
      sub.foldLeft(pcellCol * lit(SubCellCap)) { case (acc, (p, m)) =>
        when(pcellCol === p,
          lit(p * SubCellCap) + graft.functions.IvfFunctions.ivfCell(
            vecCol, m.centroids, m.metricName)).otherwise(acc)
      }

    def primaryCol(vecCol: Column): Column =
      graft.functions.IvfFunctions.ivfCell(
        vecCol, primary.centroids, primary.metricName)

    def cellCol(vecCol: Column): Column =
      cellColFrom(vecCol, primaryCol(vecCol))

    /** Driver-side probe set: the `nProbe` nearest PRIMARY cells, each
      * split parent expanded to ALL its children (the split refines
      * materialization, never the routing claim — expansion preserves
      * the exhaustive-regime guarantee that nProbe = nPrimary probes
      * every vector, which the hash oracle rides on). */
    def probeCells(qv: Array[Float], nProbe: Int): Iterator[Int] = {
      val dist = Metrics.byName(primary.metricName)
      val cs = primary.centroids
      val p = math.min(nProbe, cs.length)
      val byDist = Array.tabulate(cs.length)(c => (c, dist(qv, cs(c))))
      java.util.Arrays.sort(byDist,
        Ordering.by[(Int, Double), (Double, Int)](x => (x._2, x._1)))
      byDist.iterator.take(p).flatMap { case (c, _) =>
        sub.get(c) match {
          case Some(m) => (0 until m.nCells).iterator.map(s => c * SubCellCap + s)
          case None    => Iterator.single(c * SubCellCap)
        }
      }
    }
  }

  /** `tombstones` is the index's deletion set (sorted ids): [[delete]]
    * adds to it without touching any shard — O(deletes) handle
    * metadata, the soft-delete posture the broadcast tier's
    * searchExcluding established — and [[search]] excludes it
    * transparently. [[compact]] folds it out by rebuilding ONLY the
    * cells that hold a tombstoned id, emptying the set and freeing the
    * ids for re-[[ingest]]. */
  /** `overlay`: persisted patch RDDs this handle OWNS beyond `shards`
    * (the [[compactCellsPatched]] rebuilt-cells overlay) — released
    * with the handle. `shards` itself may be an UNPERSISTED composite
    * whose lineage reads the base index's cached blocks plus the
    * overlay; see the patched-compaction notes there. */
  final case class RoutedIndex(
      cfg: BuildConfig,
      router: Router,
      shards: org.apache.spark.rdd.RDD[(Int, CellShard)],
      tombstones: Array[Long] = Array.empty,
      overlay: Seq[org.apache.spark.rdd.RDD[_]] = Nil) {
    def unpersist(): Unit = {
      overlay.foreach(_.unpersist())
      shards.unpersist()
    }
  }

  /** One-partition-per-cell partitioner keyed by the cell's RANK in the
    * router's enumeration — never by the raw composite id. The composite
    * ids are multiples of [[SubCellCap]] for every unsplit cell, so
    * `HashPartitioner` (Int keys hash to themselves, partition =
    * id % n) collapses ALL of them into partition 0 whenever nCells
    * divides 4096 — the entire corpus in one task, the executor-OOM
    * wall the skew guard exists to prevent. Rank-keying guarantees a
    * bijection cell → partition regardless of the id arithmetic.
    * Value-equal across instances (cogroup plans a narrow dependency
    * only when the two sides' partitioners are `equals`). */
  final class CellPartitioner(val cellIds: Array[Int]) extends Partitioner {
    private val rank: java.util.HashMap[Integer, Integer] = {
      val m = new java.util.HashMap[Integer, Integer](cellIds.length * 2)
      var i = 0
      while (i < cellIds.length) { m.put(cellIds(i), i); i += 1 }
      m
    }
    override def numPartitions: Int = math.max(1, cellIds.length)
    override def getPartition(key: Any): Int = {
      val r = rank.get(key.asInstanceOf[Int])
      if (r ne null) r.intValue()
      // unknown cell (never produced by the owning router): any stable
      // slot works — keys are ints, keep them non-negative
      else ((key.asInstanceOf[Int] % numPartitions) + numPartitions) % numPartitions
    }
    override def equals(other: Any): Boolean = other match {
      case o: CellPartitioner => java.util.Arrays.equals(cellIds, o.cellIds)
      case _                  => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(cellIds)
  }

  private[hnsw] def partitionerFor(router: Router): CellPartitioner =
    new CellPartitioner(router.allCells.toArray)

  private val tripleEnc = Encoders.tuple(
    Encoders.scalaLong, ExprEnc.floatArray, Encoders.scalaInt)

  /** The float tier's [[RoutedTier]] binding — one shared lifecycle
    * ([[RoutedLifecycle]]) across the three serving tiers; only the
    * representation (LongVecMap members, float-exact cell rebuild)
    * lives here. */
  private[graft] object FloatTier extends RoutedTier[CellShard, RoutedIndex] {
    def shards(i: RoutedIndex): org.apache.spark.rdd.RDD[(Int, CellShard)] = i.shards
    def tombstones(i: RoutedIndex): Array[Long] = i.tombstones
    def overlays(i: RoutedIndex): Seq[org.apache.spark.rdd.RDD[_]] = i.overlay
    def make(i: RoutedIndex, shards: org.apache.spark.rdd.RDD[(Int, CellShard)],
             tombstones: Array[Long],
             overlays: Seq[org.apache.spark.rdd.RDD[_]]): RoutedIndex =
      RoutedIndex(i.cfg, i.router, shards, tombstones, overlays)
    val cacheName = "graft-hnsw-routed"
    val tierName = "routed"
    val unpersistBlocking = false
    val resurrectHint = "Run compact() first (frees the ids), or route " +
      "through the CDC stream, which filters tombstoned inserts"
    def memberCount(s: CellShard): Int = s.vectors.size
    def containsId(s: CellShard, id: Long): Boolean = s.vectors.contains(id)
    def idIterator(s: CellShard): Iterator[Long] = s.vectors.keysIterator
    def survivorRebuild(i: RoutedIndex): (Int, CellShard, Array[Long]) => CellShard = {
      val cfg = i.cfg
      (cell, s, dead) => {
        val rows = s.vectors.iterator
          .filter { case (id, _) =>
            java.util.Arrays.binarySearch(dead, id) < 0 }
          .toArray.sortBy(_._1)
        buildCellFresh(cell, rows, cfg)
      }
    }
  }

  private val tripleEncPcellFirst = Encoders.tuple(
    Encoders.scalaInt, Encoders.scalaLong, ExprEnc.floatArray)

  /** Modality-guard dials (the build-time separability census; see
    * [[build]]'s Scaladoc). Row floor, per-cell sample cap, the share a
    * component needs to count as STRONG (bp of the sample), the
    * single-linkage merge threshold as a multiple of the mean strong
    * RMS radius, and the census k-means shape (k > 2 is load-bearing —
    * the merged-cell audit's finding: 2-means finds the dominant
    * structure, not the modal boundary). */
  private val ModalityMinCellRows = 256L
  private val ModalitySampleMax = 1024
  private val ModalityShareBp = 1500L
  private val ModalitySepFactor = 3.0
  private val ModalityKSplit = 8
  private val ModalityIters = 8

  /** Modal census of a cell sample: deterministic k-means
    * (sample-mean + farthest-point seeds), components single-linkage-
    * merged at [[ModalitySepFactor]] × mean component RMS radius —
    * k-means over-splits a blob into adjacent fragments, and the
    * linkage pass re-merges fragments of one TRUE mode while keeping
    * genuinely separated modes apart. The strong-share test
    * ([[ModalityShareBp]]) applies to the MERGED groups, never the raw
    * components: a mode fragmented into five 10% components is still a
    * 50% mode (testing components first hid exactly half the planted
    * rung cells). Returns the strong groups as (member-weighted
    * centroid, sample count) — the centroids double as the secondary
    * quantizer for the split, so flagging costs no extra corpus scan.
    * Empty/one group = unimodal (no split). Distances linearize
    * through sqrt for l2 (Metrics.l2Sq is squared) so the factor is a
    * geometric ratio; calibration is on the l2 rehearsal geometry. */
  private[hnsw] def modalCensus(rows: Array[Array[Float]],
      metric: (Array[Float], Array[Float]) => Double,
      metricName: String): Array[(Array[Float], Int)] = {
    if (rows.length < 32) return Array.empty
    @inline def lin(d: Double): Double =
      if (metricName == "l2") math.sqrt(math.max(0.0, d)) else d
    val k = math.max(2, math.min(ModalityKSplit, rows.length / 4))
    val dim = rows.head.length
    val cents = Array.ofDim[Array[Float]](k)
    cents(0) = {
      val acc = new Array[Double](dim)
      rows.foreach { v =>
        var d = 0; while (d < dim) { acc(d) += v(d); d += 1 } }
      Array.tabulate(dim)(d => (acc(d) / rows.length).toFloat)
    }
    var j = 1
    while (j < k) {
      var best: Array[Float] = null; var bestD = -1.0
      rows.foreach { v =>
        var minD = Double.MaxValue; var c = 0
        while (c < j) { val d = metric(v, cents(c)); if (d < minD) minD = d; c += 1 }
        if (minD > bestD) { bestD = minD; best = v }
      }
      cents(j) = best; j += 1
    }
    @inline def nearest(v: Array[Float]): Int = {
      var bi = 0; var bd = Double.MaxValue; var c = 0
      while (c < k) {
        val d = metric(v, cents(c)); if (d < bd) { bd = d; bi = c }; c += 1 }
      bi
    }
    var it = 0
    while (it < ModalityIters) {
      val accs = Array.fill(k)(new Array[Double](dim))
      val ns = new Array[Int](k)
      rows.foreach { v =>
        val c = nearest(v); val acc = accs(c)
        var d = 0; while (d < dim) { acc(d) += v(d); d += 1 }
        ns(c) += 1
      }
      var c = 0
      while (c < k) {
        if (ns(c) > 0)
          cents(c) = Array.tabulate(dim)(d => (accs(c)(d) / ns(c)).toFloat)
        c += 1 // an empty component keeps its centroid
      }
      it += 1
    }
    val ns = new Array[Int](k); val sumD = new Array[Double](k)
    rows.foreach { v =>
      val c = nearest(v); ns(c) += 1; sumD(c) += metric(v, cents(c)) }
    // participants: every non-noise component (the strong test comes
    // AFTER the merge — see the Scaladoc)
    val parts = (0 until k).filter(c => ns(c) >= 8).toArray
    if (parts.length == 0) return Array.empty
    // ROBUST mass-weighted mean radius: tiny outlier fragments must not
    // drag the merge threshold down (unweighted, they shrank it enough
    // to keep a unimodal blob's main fragments apart — a false split),
    // and a mode-STRADDLING component must not inflate it (its radius
    // reads ~ the inter-mode distance/2; mass-weighted in, the linkage
    // threshold can exceed the inter-mode distance itself and the modes
    // merge into one "unimodal" group — the codes twin measured exactly
    // one of 16 planted bimodal cells escaping the guard this way at
    // the 1e6 rung). Median-radius filter: components beyond 2x the
    // median are excluded from the THRESHOLD computation only.
    val radii = parts.map(c => lin(sumD(c) / ns(c)))
    val medianRad = radii.sorted.apply(radii.length / 2)
    val keptIdx = parts.indices.filter(i =>
      medianRad == 0.0 || radii(i) <= 2.0 * medianRad)
    val meanRad = keptIdx.map(i => ns(parts(i)) * radii(i)).sum /
      math.max(1L, keptIdx.map(i => ns(parts(i)).toLong).sum)
    // single-linkage union-find over participating components; a zero
    // mean radius (distinct point masses) keeps every component apart
    val parent = Array.tabulate(parts.length)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    if (meanRad > 0.0)
      for (i <- parts.indices; jj <- (i + 1) until parts.length) {
        val d = lin(metric(cents(parts(i)), cents(parts(jj))))
        if (d < ModalitySepFactor * meanRad) {
          val (a, b) = (find(i), find(jj)); if (a != b) parent(a) = b
        }
      }
    val minShare = math.max(8L, rows.length * ModalityShareBp / 10000L)
    parts.indices.groupBy(find).values.toArray
      .map { idxs =>
        val members = idxs.map(parts(_))
        val total = members.map(ns(_)).sum
        val centroid = Array.tabulate(dim) { d =>
          (members.map(c => cents(c)(d).toDouble * ns(c)).sum / total).toFloat
        }
        (centroid, total)
      }
      .filter(_._2 >= minShare)
      .sortBy(-_._2)
  }

  /** Fresh per-cell construction from id-sorted rows (layers from the
    * id hash) — the build path's kernel, shared by [[compact]] so a
    * compacted cell is graph-identical to a fresh build of its
    * surviving rows (same insert order, same layer draws). */
  private[hnsw] def buildCellFresh(cell: Int, rows: Array[(Long, Array[Float])],
                                   cfg: BuildConfig): CellShard = {
    val metric = Metrics.byName(cfg.metric)
    val searcher = new HnswSearcher(cfg.params)
    val vecMap = LongVecMap.from(rows.iterator, rows.length)
    val graph = new InMemoryGraph
    val store = new ArrayVectorStore(metric, base = vecMap)
    rows.foreach { case (id, v) => store.prepareQueryWithId(id, v) }
    rows.foreach { case (id, v) =>
      vecMap(id) = v
      searcher.insert(store, graph, id,
        searcher.selectLayerByHash(id, cfg.seed))
    }
    CellShard(cell, vecMap, graph.snapshot)
  }

  /** Per-partition shard construction from keyed (cell, (id, vec)) rows:
    * one shard per CELL within the partition (the partitioner can
    * co-locate cells). `existing` supplies prior shards for [[ingest]]
    * (absent at build). Deterministic: rows insert in ascending id
    * order per cell, layers from the id hash. */
  private def buildShards(
      it: Iterator[(Int, (Long, Array[Float]))],
      existing: Map[Int, CellShard],
      cfg: BuildConfig): Iterator[(Int, CellShard)] = {
    val byCell = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]]
    it.foreach { case (cell, row) =>
      byCell.getOrElseUpdate(cell,
        scala.collection.mutable.ArrayBuffer.empty) += row
    }
    val metric = Metrics.byName(cfg.metric)
    val searcher = new HnswSearcher(cfg.params)
    byCell.iterator.map { case (cell, rowsBuf) =>
      val rows = rowsBuf.toArray.sortBy(_._1)
      existing.get(cell) match {
        case Some(prior) =>
          val vecMap = prior.vectors.copy(extra = rows.length)
          rows.foreach { case (id, _) =>
            require(!vecMap.contains(id),
              s"routed ingest: id $id already present in cell $cell — " +
                "re-inserting a vertex would corrupt its graph")
          }
          val graph = InMemoryGraph.fromSnapshot(prior.snapshot)
          val store = new ArrayVectorStore(metric, base = vecMap)
          rows.foreach { case (id, v) => store.prepareQueryWithId(id, v) }
          rows.foreach { case (id, v) =>
            vecMap(id) = v
            searcher.insert(store, graph, id,
              searcher.selectLayerByHash(id, cfg.seed))
          }
          cell -> CellShard(cell, vecMap, graph.snapshot)
        case None =>
          cell -> buildCellFresh(cell, rows, cfg)
      }
    }
  }

  /** `modalitySplit`: opt-in BUILD-TIME modality guard (round-15; the
    * at-build form of [[mergedCellAudit]]'s separability test). k-means
    * routinely packs several well-separated clusters into one cell —
    * the skew guard bounds SIZE, not modality, and the merged-remedy
    * rung measured an 11.6× predicated-serving floor when a later
    * delete wipes one of the co-resident clusters. With the flag on,
    * every unsplit cell above a row floor runs a sampled k-component
    * separability census (farthest-point-seeded deterministic k-means;
    * a cell is multi-modal when ≥2 components each hold ≥15% of the
    * sample and the closest pair of those strong components is ≥3×
    * their mean RMS radius apart — calibrated on the l2 rehearsal
    * geometry); flagged cells get a secondary quantizer sized to the
    * strong-component count, exactly the skew guard's split machinery.
    * Exhaustive-regime results are unchanged by construction (probe
    * expansion covers every child); what changes is that a future
    * delete aligned with one mode leaves whole CELLS dead — which
    * predicated serving skips outright — instead of half-dead cells it
    * must exact-scan. Off by default: the split adds one sampled
    * collect + one Ivf.train per flagged cell at build time. */
  def build(vectors: DataFrame, cfg: BuildConfig = BuildConfig(),
            nCells: Int = 16, persist: Boolean = true,
            maxCellRows: Long = DefaultMaxCellRows,
            modalitySplit: Boolean = false): RoutedIndex = {
    val spark = vectors.sparkSession
    // GLOBAL id dedup before cell assignment (the HnswDistributed.build
    // duplicate-id guard, but cross-cell: duplicate rows with different
    // vectors would route to DIFFERENT cells and surface the same id
    // twice in one top-k). max(vec) — arrays order lexicographically —
    // makes the surviving row deterministic, not partition-dependent.
    // pin the deduped projection: train (count + sample), the skew
    // histogram(s), any split training, and the final keyed scan each
    // run a job over it — uncached, every one would re-execute the
    // id-dedup SHUFFLE (4-6 full-corpus shuffles instead of one)
    val deduped = vectors.select(col("id"), col("vec"))
      .groupBy(col("id")).agg(max(col("vec")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val (router, cells) = planRouter(deduped, cfg, nCells, maxCellRows,
      modalitySplit)
    val part = partitionerFor(router)
    val keyed = cells
      .select(col("id"), col("vec"), col("cell"))
      .as(tripleEnc).rdd
      .map { case (id, vec, cell) => (cell, (id, vec)) }
      .partitionBy(part)
    val shards = keyed.mapPartitions(
      it => buildShards(it, Map.empty, cfg),
      preservesPartitioning = true)
    if (persist) {
      shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-routed")
      shards.count() // materialize the build eagerly
    }
    // persist=false shards stay lazy and recompute per action (the
    // test-only contract); after the unpersist below that recompute
    // re-runs the dedup shuffle — the caller opted out of pinning
    RoutedIndex(cfg, router, shards)
    } finally deduped.unpersist(blocking = false)
  }

  /** Router planning — everything between the id-dedup'd input and
    * shard construction, shared by [[build]] and the PQ tier's
    * float-free [[HnswRoutedPq.buildSolo]]: primary k-means training,
    * the skew guard's secondary splits, the opt-in modality guard, and
    * the final per-row cell assignment. `deduped` must be (id, vec),
    * id-unique, and PERSISTED by the caller (this runs several jobs
    * over it). Returns the router and the assignment projection
    * (id, vec, cell). */
  private[hnsw] def planRouter(deduped: DataFrame, cfg: BuildConfig,
                               nCells: Int, maxCellRows: Long,
                               modalitySplit: Boolean): (Router, DataFrame) = {
    require(nCells >= 1 && nCells <= (Int.MaxValue / SubCellCap),
      s"nCells in [1, ${Int.MaxValue / SubCellCap}], got $nCells")
    val spark = deduped.sparkSession
    val primary = Ivf.train(deduped, nCells, cfg.metric, seed = cfg.seed)
    val assigned = deduped.withColumn("pcell",
      graft.functions.IvfFunctions.ivfCell(
        col("vec"), primary.centroids, primary.metricName))

    // ---- Skew guard: the per-cell build below materializes each cell
    // in executor memory (no spill path — the graph kernel is an
    // in-memory structure by design), so a histogram gates entry. One
    // cheap agg (nCells output rows) against the scan the shuffle pays
    // anyway; cells above the budget get a SECONDARY quantizer
    // (recursive refinement), and a cell that cannot be split — near-
    // duplicate mass the metric cannot separate — fails fast at entry
    // with the dials, not at the executor OOM/Kryo wall mid-build.
    val hist = assigned.groupBy(col("pcell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val oversized = hist.filter(_._2 > maxCellRows)
    val sub = oversized.map { case (p, n) =>
      // target half-budget children so typical splits land comfortably
      // under the budget; capped by the id-stride envelope
      val k2 = math.min(SubCellCap.toLong,
        math.max(2L, (2L * n + maxCellRows - 1) / maxCellRows)).toInt
      p -> Ivf.train(assigned.filter(col("pcell") === p), k2, cfg.metric,
        seed = cfg.seed + 1000003L * (p + 1))
    }
    // ---- Build-time modality guard (opt-in; see the Scaladoc): run
    // the sampled separability census on every unsplit cell above the
    // row floor, split the multi-modal ones by their strong-component
    // count. One decimated collect serves ALL audited cells; per-cell
    // sample bounded by ModalitySampleMax.
    val subM: Map[Int, Ivf.IvfModel] =
      if (!modalitySplit) sub
      else {
        val metric = Metrics.byName(cfg.metric)
        val audit = hist.filter { case (p, cn) =>
          !sub.contains(p) && cn >= ModalityMinCellRows }
        if (audit.isEmpty) sub
        else {
          val strides = audit.toSeq.map { case (p, cn) =>
            (p, math.max(1L, (cn + ModalitySampleMax - 1) / ModalitySampleMax))
          }
          val strideDf = spark.createDataFrame(strides)
            .toDF("pcell", "__stride")
          val sampled = assigned
            .join(broadcast(strideDf), Seq("pcell"))
            .filter(pmod(xxhash64(col("id"), lit(cfg.seed)), col("__stride")) === 0L)
            .select(col("pcell"), col("id"), col("vec"))
            .as(tripleEncPcellFirst).collect()
          val byCell = sampled.groupBy(_._1)
          val flagged = audit.keys.toSeq.sorted.flatMap { p =>
            byCell.get(p).flatMap { rs =>
              val rows = rs.sortBy(_._2).take(ModalitySampleMax).map(_._3)
              val groups = modalCensus(rows, metric, cfg.metric)
              if (groups.length >= 2) Some(p -> groups) else None
            }
          }
          // the census's group centroids ARE the secondary quantizer:
          // children align with the detected modes by construction, and
          // the split costs no additional corpus scan (the skew guard's
          // per-cell Ivf.train re-scan would be one full pass per
          // flagged cell — at many flagged cells that dominates the
          // build)
          sub ++ flagged.map { case (p, groups) =>
            p -> Ivf.IvfModel(
              groups.take(SubCellCap).map(_._1), cfg.metric)
          }
        }
      }
    val router = Router(primary, subM)
    val cells = assigned
      .withColumn("cell", router.cellColFrom(col("vec"), col("pcell")))
    if (subM.nonEmpty) {
      val subHist = cells.filter(col("pcell").isin(subM.keys.toSeq: _*))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
      val still = subHist.filter(_._2 > maxCellRows)
      require(still.isEmpty,
        s"HnswRouted.build: ${still.length} cell(s) still exceed " +
          s"maxCellRows=$maxCellRows after a secondary split (largest: " +
          s"${still.map(_._2).max} rows) — the mass is closer than the " +
          "quantizer can separate. Dials: raise nCells, raise " +
          "maxCellRows (more executor memory per cell), or use the " +
          "durable frontier tier (HnswDurable), which never " +
          "materializes a cell in memory")
    }
    (router, cells)
  }

  /** Incremental ingest: route `newRows` by cell and merge PER CELL —
    * each touched cell's graph absorbs its batch slice with the same
    * sequential kernel the build uses (the HnswDurable.ingest pattern,
    * per cell). The index side has a NARROW dependency (shards are
    * already partitioned by cell): only the batch shuffles, never the
    * corpus. Rows landing in a cell the router knows but the index
    * holds no shard for (possible after attach of a pruned save) start
    * a fresh shard. Ids must be new to the INDEX — a global broadcast
    * guard fails fast naming the cell that already holds a clashing id
    * (the per-cell check alone would miss an id whose drifted vector
    * routes to a different cell). The CENTROIDS ARE FROZEN —
    * routing drift under distribution shift is the audit
    * [[cellStats]] exists for; retrain + rebuild is the recovery.
    * Returns a NEW index sharing the router; the old shards are
    * unpersisted when `persist` is set. */
  def ingest(index: RoutedIndex, newRows: DataFrame,
             persist: Boolean = true): RoutedIndex = {
    val cfg = index.cfg
    val router = index.router
    val spark = newRows.sparkSession
    val deduped = newRows.select(col("id"), col("vec"))
      .groupBy(col("id")).agg(max(col("vec")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // GLOBAL duplicate-id guard (cross-cell): the per-cell fail-fast in
    // buildShards only sees the id's TARGET cell — an id already built
    // into cell A, redelivered with a drifted vector that routes to
    // cell B, would pass it and double-register, so one top-k could
    // return the same id twice. The batch id set is batch-sized:
    // broadcast it sorted and narrow-scan every shard's key set (no
    // shuffle, the corpus never moves).
    val batchIds = deduped.select(col("id"))
      .as(Encoders.scalaLong).collect()
    java.util.Arrays.sort(batchIds)
    // shared fail-fast guards (RoutedLifecycle): tombstoned-id
    // resurrect (driver-side, no job) + cross-cell duplicate-id scan
    // (one narrow broadcast pass). The CDC stream is the lenient path
    // that filters instead.
    RoutedLifecycle.guardResurrect(FloatTier)(index, batchIds)
    RoutedLifecycle.guardClashes(FloatTier)(index, batchIds)
    val part = index.shards.partitioner.getOrElse(partitionerFor(router))
    val keyed = deduped
      .select(col("id"), col("vec"), router.cellCol(col("vec")).as("cell"))
      .as(tripleEnc).rdd
      .map { case (id, vec, cell) => (cell, (id, vec)) }
      .partitionBy(part)
    val merged = index.shards.cogroup(keyed).mapPartitions({ it =>
      val additions = scala.collection.mutable.ArrayBuffer
        .empty[(Int, (Long, Array[Float]))]
      val untouched = scala.collection.mutable.ArrayBuffer.empty[(Int, CellShard)]
      val prior = Map.newBuilder[Int, CellShard]
      it.foreach { case (cell, (shards, rows)) =>
        if (rows.isEmpty) shards.foreach(s => untouched += (cell -> s))
        else {
          shards.foreach(s => prior += (cell -> s))
          rows.foreach(r => additions += (cell -> r))
        }
      }
      untouched.iterator ++
        buildShards(additions.iterator, prior.result(), cfg)
    }, preservesPartitioning = true)
    if (persist) {
      merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-routed")
      merged.count()
      index.shards.unpersist(blocking = false)
      // a patched prior also owned an overlay stack — release it with
      // the shards it patched
      index.overlay.foreach(_.unpersist())
    }
    // the deletion set survives ingest (dropping it would silently
    // resurrect deleted ids after the next insert batch — caught by
    // the CDC spec); overlays stay tracked unless just released
    RoutedIndex(cfg, router, merged, index.tombstones,
      overlay = if (persist) Nil else index.overlay)
    } finally deduped.unpersist(blocking = false)
  }

  /** Which of `ids` are present in the index (any cell) — ONE narrow
    * broadcast scan over the shard key sets (the ingest guard's
    * machinery, exposed as a query): the CDC stream uses it to DROP
    * redelivered ids for idempotence where batch ingest fail-fasts.
    * `ids` must be sorted ascending; returns a sorted subset. */
  def presentIds(index: RoutedIndex, ids: Array[Long]): Array[Long] =
    RoutedOps.presentIds(index.shards, ids)((s, f) => s.vectors.foreachKey(f))

  /** Tombstone delete — delete-without-rebuild on the routed tier: adds
    * `ids` to the index's deletion set and returns a new handle SHARING
    * the shards (no RDD job beyond collecting the id column — deletes
    * are O(set) driver/broadcast metadata, the posture the broadcast
    * tier's searchExcluding and the durable tier's tombstones share).
    * [[search]]/[[searchFiltered]] exclude the set transparently;
    * tombstoned vertices still CONDUCT the in-cell traversal (their
    * edges remain — standard soft delete). A deleted id cannot be
    * re-[[ingest]]ed until [[compact]] folds it out of its cell (the
    * ingest guard still sees it in the shard's key set — by design: the
    * graph still holds the old vector). Deleting an id ABSENT from the
    * index is accepted (membership is never checked) but is NOT a pure
    * no-op: the id joins the deletion set, so a later [[ingest]] of it
    * fail-fasts until [[compact]] clears the set — delete-wins is the
    * deliberate resolution of a delete/insert race, and the guard is
    * what keeps a late insert from landing rows that search excludes
    * and the next compact would erase. */
  def delete(index: RoutedIndex, ids: DataFrame): RoutedIndex =
    RoutedLifecycle.delete(FloatTier)(index, ids)

  /** Fold the deletion set out of the graphs: rebuild ONLY the cells
    * that hold a tombstoned id — untouched cells pass through BY
    * REFERENCE (no copy, no rebuild, no shuffle; the map is narrow on
    * the pinned partitioner), so compaction cost is proportional to
    * AFFECTED cells, not the index. A compacted cell is rebuilt fresh
    * from its survivors with the build kernel ([[buildCellFresh]]:
    * ascending id order, layers from the id hash), so it is
    * graph-identical to a fresh build of the remaining rows — the
    * "compaction preserves the served result" contract, spec-checked.
    * The returned index has an EMPTY deletion set; compacted-away ids
    * are free to re-[[ingest]]. `unpersistPrior = false` leaves the
    * input index's shards cached (for callers serving both handles,
    * e.g. the catalog's shared build). */
  def compact(index: RoutedIndex, persist: Boolean = true,
              unpersistPrior: Boolean = true): RoutedIndex =
    RoutedLifecycle.compact(FloatTier)(index, persist, unpersistPrior,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Targeted compaction: fold the deletion set out of ONLY the listed
    * cells — the [[mergedCellAudit]] remedy. [[compact]]'s whole-index
    * sibling rebuilds every touched cell; this rebuilds the flagged
    * subset (narrow map, untouched cells pass by reference) and
    * SHRINKS the tombstone set by exactly the ids that lived there, so
    * the remaining deletion set keeps serving the untouched cells'
    * soft deletes. A remediated cell's members are all live again →
    * predicated serving takes the identity-filter plain kernel on it
    * (the structural form of the "≤1.2× plain" remedy: the 1.5×
    * merged-cell floor was the exact scan over eligible mass the beam
    * can't reach; post-compact there is no ineligible mass to dodge).
    * Cost: O(listed cells) rebuild CPU + one pruned pass to collect
    * the folded-out ids (bounded by |tombstones|). */
  def compactCells(index: RoutedIndex, cells: Array[Int],
                   persist: Boolean = true,
                   unpersistPrior: Boolean = true): RoutedIndex =
    RoutedLifecycle.compactCells(FloatTier)(index, cells, persist,
      unpersistPrior, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** [[compactCells]] with O(touched) PERSISTED BYTES — the patch
    * answer to the measured cost of targeted compaction: the plain
    * variant's narrow map is O(touched) CPU but persisting its output
    * materializes a full-size new image while the old stays live (the
    * 1e8 rung read 839.7 s to fold 3 of 1024 cells — all block churn,
    * and the first post-compact serve paid a 33 s cold read of the
    * freshly spilled copy). Here only the REBUILT cells persist (an
    * overlay RDD whose untouched partitions are empty blocks), and the
    * served `shards` is an unpersisted partitioner-preserving
    * zipPartitions COMPOSITE: overlay shard if present, else the
    * base's cached block (object-shared, no copy). The base index must
    * STAY cached (the composite reads its blocks — that is the point);
    * the returned handle owns only the overlay. Patches STACK (a
    * patched index can be patched again); fold the stack back to one
    * full image with [[foldOverlay]] on a cadence, or let the next
    * whole-index [[compact]]/[[retrain]]/[[ingest]] materialize a full
    * image anyway. Serving results are row-identical to
    * [[compactCells]] (spec-pinned). */
  def compactCellsPatched(index: RoutedIndex, cells: Array[Int],
                          persist: Boolean = true): RoutedIndex =
    RoutedLifecycle.compactCellsPatched(FloatTier)(index, cells, persist)

  /** Materialize a patched index back into ONE persisted full image
    * and release the overlay stack — the fold that bounds patch-stack
    * depth. A handle with no overlay returns unchanged. */
  def foldOverlay(index: RoutedIndex): RoutedIndex =
    RoutedLifecycle.foldOverlay(FloatTier)(index,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Merged-cell audit — detection for the regime the per-cell density
    * census cannot see (ROUND14 §5's residual): k-means merged a DEAD
    * cluster and a live cluster into one cell, so the cell reads ~50%
    * eligible cell-wide while a query arriving on the dead side has
    * ~zero eligible among its nearest — predicated serving there pays
    * the exact scan every probe (the measured 1.5× floor).
    *
    * Detection is a per-cell geometric SEPARABILITY test, one narrow
    * pass, no shuffle: cells whose dead fraction is bimodal-eligible
    * (inside [minDeadBp, maxDeadBp], at least `minCellRows` members)
    * run a deterministic `kSplit`-means whose first two seeds are the
    * dead-member mean and the live-member mean (the hypothesis-shaped
    * init) and whose remaining seeds are farthest-point picks — k > 2
    * is load-bearing: a dense cell can merge SEVERAL clusters (the 1e6
    * rehearsal packed four), and a single 2-means split then finds the
    * dominant geometric structure, not the dead/live boundary (measured:
    * a 25%-dead four-cluster cell read 50/0 purity at k=2 — unflagged
    * at a 9× serving tax). If dead and live are interleaved, every
    * component's dead fraction reads ≈ the cell-wide fraction (no
    * flag); if the dead mass is its own cluster, some component
    * isolates it. A cell is flagged `merged` when ≥80%-pure-dead
    * components hold ≥80% of the cell's dead mass and a clearly-live
    * component (≤20% dead) exists. Returns one row per AUDITED cell:
    * (cell, n, n_dead, dead_bp, hi_dead_bp = max component purity,
    * lo_dead_bp = min component purity, dead_mass_hi_bp = dead mass in
    * pure-dead components, merged). Remedy: [[compactCells]] on the
    * flagged ids (or the skew-split/retrain path when live density
    * also warrants re-routing). */
  def mergedCellAudit(index: RoutedIndex, minCellRows: Int = 1024,
                      minDeadBp: Int = 1000, maxDeadBp: Int = 9000,
                      sampleMax: Int = 4096, iters: Int = 8,
                      kSplit: Int = 8): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val cfg = index.cfg
    val tombB = index.shards.sparkContext.broadcast(index.tombstones)
    val rows = index.shards.flatMap { case (cell, s) =>
      val dead = tombB.value
      val cellN = s.vectors.size
      if (dead.length == 0 || cellN < minCellRows) Iterator.empty
      else {
        @inline def isDead(id: Long): Boolean =
          java.util.Arrays.binarySearch(dead, id) >= 0
        var nDead = 0
        s.vectors.keysIterator.foreach(id => if (isDead(id)) nDead += 1)
        val deadBp = nDead * 10000L / cellN
        if (deadBp < minDeadBp || deadBp > maxDeadBp) Iterator.empty
        else {
          // the separability test is the SHARED float-space kernel
          // ([[MergedCellAudit.auditCell]] — also run by the PQ tier
          // over code reconstructions); sampling/seeding rationale
          // lives on the kernel
          val all = s.vectors.toArray.sortBy(_._1)
          val (hiBp, loBp, massHiBp, merged) = MergedCellAudit.auditCell(
            all, Metrics.byName(cfg.metric), isDead, nDead,
            sampleMax, iters, kSplit)
          Iterator.single((cell, cellN.toLong, nDead.toLong, deadBp,
            hiBp, loBp, massHiBp, merged))
        }
      }
    }.collect()
    rows.toSeq.toDF("cell", "n", "n_dead", "dead_bp",
      "hi_dead_bp", "lo_dead_bp", "dead_mass_hi_bp", "merged")
  }

  /** Detect-and-remediate: [[mergedCellAudit]] → targeted compaction
    * on the flagged cells — PATCHED by default (O(touched) persisted
    * bytes; the base index stays cached and keeps serving its own
    * handle), the full-copy [[compactCells]] when `patched = false`
    * (`unpersistPrior` applies only there). Returns the remediated
    * index (the input handle, unchanged, when nothing is flagged) and
    * the flagged cell ids. */
  def remediateMergedCells(index: RoutedIndex, minCellRows: Int = 1024,
                           persist: Boolean = true,
                           unpersistPrior: Boolean = true,
                           patched: Boolean = true): (RoutedIndex, Array[Int]) = {
    val flagged = mergedCellAudit(index, minCellRows)
      .filter(col("merged")).select(col("cell"))
      .collect().map(_.getInt(0))
    if (flagged.isEmpty) (index, flagged)
    else if (patched) (compactCellsPatched(index, flagged, persist), flagged)
    else (compactCells(index, flagged, persist, unpersistPrior), flagged)
  }

  /** The drift RECOVERY operator — the global fold the [[driftAudit]]
    * alarm points at ("retrain + rebuild", since [[ingest]] never
    * moves centroids): re-train the router on the index's CURRENT
    * corpus and rebuild from its own shards — no external table
    * needed. One extraction pass over the shards (tombstones fold out
    * here, so the deletion set empties like [[compact]]), then the
    * standard [[build]]: fresh k-means on the live distribution,
    * histogram/skew guard, ONE shuffle, per-cell construction. Skewed
    * cells rebalance; split cells may unsplit; `nCells = 0` keeps the
    * current primary cell count. Exhaustive-regime results are
    * unchanged by construction (routing never affects the exhaustive
    * oracle) — what changes is the nProbe-regime recall the drift was
    * eroding. */
  def retrain(index: RoutedIndex, nCells: Int = 0, persist: Boolean = true,
              maxCellRows: Long = DefaultMaxCellRows): RoutedIndex = {
    val spark = SparkSession.active
    val n = if (nCells > 0) nCells else index.router.nPrimary
    val tombB = index.shards.sparkContext.broadcast(index.tombstones)
    val pairEnc = Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)
    val rows = index.shards.flatMap { case (_, s) =>
      val dead = tombB.value
      s.vectors.iterator.filter { case (id, _) =>
        dead.length == 0 || java.util.Arrays.binarySearch(dead, id) < 0
      }
    }
    val df = spark.createDataset(rows)(pairEnc).toDF("id", "vec")
    build(df, index.cfg, n, persist, maxCellRows)
  }

  /** Opt-in serving WARM-UP — the post-attach/fold first-serve
    * discipline. The measured tax (BASELINE rounds 14-15): the first
    * serve after a build/attach/fold reads 10-40x the steady band at
    * the DISK_ONLY decades (42.6 s vs 4-8 s at 1e7; 128.3 s composite
    * at 1e8), diagnosed via PlanProbe/PatchTaskProbe as COLD BLOCK
    * READS with pruning intact — the bytes had to come off disk
    * sometime, and "sometime" was the first query. This pass moves
    * that read OFF the serving path: one full deserializing sweep of
    * every shard partition (base + overlay blocks for a patched
    * composite), priming the OS page cache / block-manager residency
    * the first probes would otherwise pay for. Serving results are
    * untouched (the pass only counts); returns the shard count.
    * Operate it on the fold/attach cadence, not per query. */
  def warm(index: RoutedIndex): Long = RoutedOps.warm(index.shards)

  /** Covering-probe warm-up: ONE real k=1 serve whose query batch holds
    * one member vector per cell — each query routes back to its own
    * cell (the router that assigned it is frozen), so every cell runs a
    * real beam and the whole serving path (driver routing, codegen,
    * broadcast, the per-cell kernel's JIT + allocation ramp) executes
    * once off the serving path. [[warm]]'s block sweep pays only the
    * disk read — the 1e7 rung measured a 1.9x first-serve residual
    * after it, which is exactly the kernel/plan warm-up this probe
    * pays. Returns the number of cells probed. */
  def warmProbe(index: RoutedIndex, ef: Int = 16): Long = {
    val reps = index.shards.flatMap { case (cell, s) =>
      s.vectors.iterator.take(1).map { case (_, v) => (cell.toLong, v) }
    }.collect()
    if (reps.isEmpty) 0L
    else {
      val spark = SparkSession.active
      import spark.implicits._
      val qDf = reps.toSeq.toDF("qid", "qvec")
      search(index, qDf, k = 1, nProbe = 1, ef0 = ef).count()
      reps.length.toLong
    }
  }

  /** Per-cell occupancy (cell, rows) — the drift audit surface: compare
    * against the build-time histogram to decide when frozen centroids
    * have drifted far enough to warrant retraining. */
  def cellStats(index: RoutedIndex): Array[(Int, Long)] =
    RoutedOps.cellStats(index.shards)(_.vectors.size)

  /** Drift audit as a DataFrame — the routed tier's silent-recall-killer
    * alarm: frozen centroids under distribution shift send new mass to
    * cells whose graphs were built for a different density, so recall
    * erodes with NO error anywhere. The audit routes `incoming` (a
    * recent batch / sample of the current stream) through the frozen
    * router and compares its per-cell share in basis points against the
    * index's current occupancy share: one row per router cell,
    * `drift_bp = |index_share_bp - batch_share_bp|`. Operating
    * discipline: a sustained max(drift_bp) above ~2x the uniform share
    * (20000/nCells bp) says the router's spatial claim no longer
    * matches the data — retrain + rebuild is the recovery ([[ingest]]
    * never moves centroids by design). Costs one codegen'd assignment
    * scan over the batch + the nCells-row occupancy collect. */
  def driftAudit(index: RoutedIndex, incoming: DataFrame): DataFrame = {
    val spark = incoming.sparkSession
    import spark.implicits._
    val occ = cellStats(index).toMap
    val occTotal = math.max(1L, occ.values.sum)
    val inc = incoming
      .select(index.router.cellCol(col("vec")).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val incTotal = math.max(1L, inc.values.sum)
    index.router.allCells.map { c =>
      val idxRows = occ.getOrElse(c, 0L)
      val batchRows = inc.getOrElse(c, 0L)
      val idxBp = idxRows * 10000L / occTotal
      val batchBp = batchRows * 10000L / incTotal
      (c, idxRows, idxBp, batchRows, batchBp, math.abs(idxBp - batchBp))
    }.toDF("cell", "index_rows", "index_share_bp",
      "batch_rows", "batch_share_bp", "drift_bp")
  }

  /** Density-adaptive default for the in-cell layer-0 beam: the 1e7
    * rehearsal's finding is that DENSE cells (156k near-duplicates in
    * one cell) miss at the configured ef_search regardless of fan-out —
    * probe4 and probe64 run the same in-cell search. Cells small
    * relative to ef are near-exhaustive already and keep the configured
    * beam (so catalog-scale plans are unchanged); above 8×ef the beam
    * widens with log2(cellSize)/4 — calibrated on the rehearsal rung
    * (ef 32 → 144 at 156k rows, vs the manually-found 128 at 95.9%
    * self-match). */
  def autoEf(efSearch: Int, cellSize: Int): Int =
    if (cellSize <= 8L * efSearch) efSearch
    else {
      val log2ceil = 32 - Integer.numberOfLeadingZeros(math.max(1, cellSize - 1))
      math.max(efSearch, efSearch * log2ceil / 4)
    }

  /** Restrict `shards` to the partitions that can hold `probedCells` —
    * a narrow [[org.apache.spark.rdd.PartitionPruningRDD]] over the
    * pinned partitioner, so a search job schedules ONLY the probed
    * cells' tasks. The 1e8 rehearsal surfaced why this matters: at
    * 1024 cells a full flatMap pass costs 1024 task launches even when
    * 8 cells do work — the serving floor became the partition pass,
    * not the probes. With rank-keyed cells the probe set IS the
    * partition set. Falls back to the unpruned RDD when no partitioner
    * is pinned (never the case for build/attach/ingest outputs). */
  private[hnsw] def prunedShards[S](
      shards: org.apache.spark.rdd.RDD[(Int, S)],
      probedCells: Iterable[Int]): org.apache.spark.rdd.RDD[(Int, S)] =
    shards.partitioner match {
      case Some(p) =>
        val keep = probedCells.map(p.getPartition(_: Any)).toSet
        org.apache.spark.rdd.PartitionPruningRDD.create(shards, keep.contains)
      case None => shards
    }

  /** Search the routed index: only the nProbe cells a query routed to
    * ever see it; per-cell HNSW answers top-k; tiny global merge
    * (<= k rows per query per probed cell). Returns (qid, id, dist, rank).
    *
    * `ef0` widens ONLY the in-cell layer-0 beam — the recall knob the
    * 1e7 rehearsal identified (dense cells miss at the default
    * ef_search regardless of how many cells are probed). `ef0 = 0` (the
    * default) applies the density-adaptive [[autoEf]] per cell; an
    * explicit value pins the beam manually. Widening ef costs
    * per-probed-cell work; adding cells costs fan-out — independent
    * dials for the two loss modes. */
  def search(index: RoutedIndex, queries: DataFrame, k: Int,
             nProbe: Int, ef0: Int = 0): DataFrame =
    searchImpl(index, queries, k, nProbe, ef0, allowed = None)

  /** Attribute-filtered routed k-NN: top-k among only the ids in
    * `allowed` (one id column) — the broadcast tier's
    * [[HnswDistributed.searchFiltered]] contract on the scale tier.
    * The allow-set broadcasts as a sorted primitive array (8 B/id,
    * binary-search membership — the id list of a label partition); each
    * probed cell serves one overfetched beam with an exact in-cell
    * fallback (see [[searchImpl]]). Routing is UNCHANGED: a query still
    * probes its nProbe nearest cells, so a selective predicate whose
    * mass lives in unprobed cells costs recall exactly like any other
    * cross-boundary neighbor — the exhaustive regime (nProbe = nCells)
    * forces the exact path and is the oracle-exact configuration, and
    * tombstones compose (an id must be allowed AND not deleted).
    *
    * ROUTING: the allow-set is `distinct().collect()`ed here once per
    * call while it fits [[AllowCollectMax]] (a caller issuing many
    * batches against the SAME small allow-set should collect once and
    * reuse via [[searchFilteredIds]]); above the cutover the call
    * reroutes through [[searchFilteredDistributed]] — no driver-side
    * copy at any size. */
  def searchFiltered(index: RoutedIndex, queries: DataFrame,
                     allowed: DataFrame, k: Int, nProbe: Int,
                     ef0: Int = 0): DataFrame =
    RoutedLifecycle.allowProbe(allowed, AllowCollectMax) match {
      case None =>
        searchFilteredDistributed(index, queries, allowed, k, nProbe, ef0)
      case some =>
        searchImpl(index, queries, k, nProbe, ef0, allowed = some)
    }

  /** [[searchFiltered]] with a pre-collected allow-set — the repeat-
    * caller path (collect + sort the id array once, serve many query
    * batches against it without re-running the distinct/collect job).
    * `allowedIds` must be sorted ascending and duplicate-free. */
  def searchFilteredIds(index: RoutedIndex, queries: DataFrame,
                        allowedIds: Array[Long], k: Int, nProbe: Int,
                        ef0: Int = 0): DataFrame =
    searchImpl(index, queries, k, nProbe, ef0, allowed = Some(allowedIds))

  /** Allow-sets above this count route DISTRIBUTEDLY
    * ([[searchFilteredDistributed]]) instead of through the driver
    * collect: the driver copy is 8 B/id plus boxing, and it repeats
    * per call — at the 1e8-id decade (a large label partition) the
    * collect is an OOM wall. 16M ids ≈ 128 MB driver-side keeps the
    * common online filter on the cheap path. */
  val AllowCollectMax: Int = 16 * 1024 * 1024

  /** Fully distributed attribute-filtered serving — no driver-side
    * materialization of EITHER the query batch or the allow-set: the
    * allow-set joins against the index's own (id → cell) pairs (one
    * narrow flatMap over the shards' key sets — each id lives in
    * exactly one cell, so the join output is |allow| rows), shuffles
    * by the pinned partitioner, and rides a 3-way zipPartitions with
    * the shards and the routed queries; the per-cell sorted allow
    * array is built executor-side. Same per-shard kernel as every
    * other path (row-identity spec-pinned). [[searchFiltered]]
    * auto-selects this path above [[AllowCollectMax]] ids. */
  def searchFilteredDistributed(index: RoutedIndex, queries: DataFrame,
                                allowed: DataFrame, k: Int, nProbe: Int,
                                ef0: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val sc = spark.sparkContext
    val cfg = index.cfg
    val exhaustive = nProbe >= index.router.nPrimary
    val routerB = sc.broadcast(index.router)
    val tombB = sc.broadcast(index.tombstones)
    val part = index.shards.partitioner.getOrElse(throw new IllegalStateException(
      "distributed routing needs the index's pinned CellPartitioner"))
    val pairEnc = Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)
    val routed = queries.select(col("qid"), col("qvec")).as(pairEnc).rdd
      .flatMap { case (qid, qv) =>
        routerB.value.probeCells(qv, nProbe).map(c => (c, (qid, qv)))
      }.partitionBy(part)
    val allowByCell = RoutedLifecycle.allowByCell(FloatTier)(index, allowed, part)
    import spark.implicits._
    val perShard = RoutedLifecycle.zipServeFiltered(
        index.shards, routed, allowByCell) {
      (m: CellShard, probes: Iterator[(Long, Array[Float])], allow: Array[Long]) =>
        serveShard(cfg, m, probes, k, ef0, exhaustive,
          hasAllow = true, allow, tombB.value)
    }.toDF("qid", "id", "dist")
    rankMerge(perShard, k)
  }

  private[hnsw] def sortedIdArray(ids: DataFrame): Array[Long] = {
    val arr = ids.select(col(ids.columns.head).cast("long")).distinct()
      .as(Encoders.scalaLong).collect()
    java.util.Arrays.sort(arr)
    arr
  }

  /** Queries above this count route DISTRIBUTEDLY ([[searchDistributed]])
    * instead of through the driver collect: the driver path holds
    * nProbe copies of every (qid, qvec) on the driver AND in one
    * broadcast — fine for online serving (a query batch ≪ corpus),
    * an OOM wall when the routed tier is the batch side of a large
    * similarity join. At 256k queries × nProbe 4 × dim 64 the driver
    * copy is ~300 MB; the cutover keeps it there. */
  val DriverRouteMax: Int = 262144

  /** Distributed query routing — the BATCH-side serving path: queries
    * stay a DataFrame end-to-end. Each query row fans out to its
    * nProbe cells against the broadcast router (centroids are tiny
    * next to everything), and the ONLY shuffle is the query side,
    * keyed by the index's pinned [[CellPartitioner]] — the shard side
    * is a narrow zipPartitions, exactly the ingest discipline. Result
    * rows are identical to [[search]] (same per-shard kernel, same
    * (dist, id)-ordered global merge), spec-pinned on both paths.
    * Per-executor bound: one cell's routed query mass must fit its
    * task (at 1e6 queries × nProbe 4 over 16 cells ≈ 250k rows/cell —
    * ~70 MB at dim 64), which scales out with nCells where the driver
    * path's bound cannot. [[search]] auto-selects this path above
    * [[DriverRouteMax]] queries. */
  def searchDistributed(index: RoutedIndex, queries: DataFrame, k: Int,
                        nProbe: Int, ef0: Int = 0): DataFrame =
    searchImplDistributed(index, queries, k, nProbe, ef0, allowed = None)

  /** Per-shard serving kernel, shared verbatim by the driver-routed
    * and distributed-routed paths (path equality is structural, not
    * coincidental). Serves `probes` against one cell: plain beam when
    * unpredicated; census → identity-filter / one-overfetched-beam /
    * exact-scan discipline when predicated (exhaustive regime forces
    * the exact scan — the hash-oracle configuration). */
  private[hnsw] def serveShard(
      cfg: BuildConfig, m: CellShard,
      probes: Iterator[(Long, Array[Float])],
      k: Int, ef0: Int, exhaustive: Boolean,
      hasAllow: Boolean, allow: Array[Long],
      dead: Array[Long]): Iterator[(Long, Long, Double)] = {
    val metric = Metrics.byName(cfg.metric)
    val searcher = new HnswSearcher(cfg.params)
    val base = cfg.params.getEfSearch(0)
    val ef = if (ef0 > 0) math.max(ef0, base)
             else autoEf(base, m.vectors.size)
    // one store per shard, -1 query slot re-staged per query (the
    // searchSharded pattern)
    val qStore = new ArrayVectorStore(metric, base = m.vectors)
    val predicated = hasAllow || dead.nonEmpty
    if (!predicated)
      probes.flatMap { case (qid, qvec) =>
        val q = qStore.prepareQueryWithId(-1L, qvec)
        searcher.searchWithEf(qStore, m.snapshot, q, k, ef)
          .iterator.map(nb => (qid, nb.dst, nb.dist))
      }
    else {
          // Predicated serving (the HnswDistributed.searchPredicated
          // discipline, executor-local to the shard). Accuracy contract:
          // EXACT whenever the exact-scan path serves — which is every
          // cell in the exhaustive regime (forced below), plus any cell
          // the density cutover routes to exact — and otherwise at least
          // as accurate as the plain kernel (one overfetched beam whose
          // eligible prefix carries the queue's total (dist, id) order).
          // Census/eligibleIds/exact-scan machinery is the SHARED
          // [[PredicatedCensus]] kernel (one copy across the three
          // routed tiers — see its Scaladoc for the measured rationale
          // behind each discipline).
          val cen = new PredicatedCensus.Census(
            PredicatedCensus.Members.ofVecMap(m.vectors),
            hasAllow, allow, dead)
          @inline def eligible(id: Long): Boolean = cen.eligible(id)
          val cellN = cen.cellN
          def exactScan(qid: Long, q: Long): List[(Long, Long, Double)] =
            PredicatedCensus.exactScanTopK(cen.eligibleIds, k,
                id => qStore.evalDistance(q, id))
              .iterator.map(nb => (qid, nb.dst, nb.dist)).toList
          val kp0 = math.max(4 * k, ef)
          if (cen.eligibleCount == 0) Iterator.empty
          else if (exhaustive)
            // exactness is structural here, not small-cell luck: the
            // filtered/tombstone hash-oracle rows serve through this
            // branch (identity-filter cells included — a plain beam
            // there would re-introduce the plain kernel's approximation
            // into a result the oracle demands exact)
            probes.flatMap { case (qid, qvec) =>
              exactScan(qid, qStore.prepareQueryWithId(-1L, qvec))
            }
          else if (cen.eligibleCount == cellN)
            // every member eligible -> the filter is the identity:
            // serve on the unmodified plain kernel (cell-local
            // deletions cost ~nothing on untouched cells; see the
            // codes tier's note on the measured wrapper tax)
            probes.flatMap { case (qid, qvec) =>
              val q = qStore.prepareQueryWithId(-1L, qvec)
              searcher.searchWithEf(qStore, m.snapshot, q, k, ef)
                .iterator.map(nb => (qid, nb.dst, nb.dist))
            }
          else probes.flatMap { case (qid, qvec) =>
            val q = qStore.prepareQueryWithId(-1L, qvec)
            // density-aware cutover (see the codes tier's note): a
            // low-eligible-fraction cell defeats the beam — while the
            // exact scan is O(eligible) per query
            if (cen.cutoverToExact(kp0)) exactScan(qid, q)
            else {
              // ONE overfetched beam, then exact — never escalate
              // in-cell. Escalation is the BROADCAST tier's discipline,
              // where "exact" means a corpus-wide scan; per cell the
              // exact scan is bounded by cellN and costs less than one
              // 4x re-beam. The regime that needs this is GEOMETRIC
              // eligibility clustering the density census cannot see: a
              // merged cell holding a dead cluster beside a live one
              // reads 50% eligible cell-wide, but a query arriving near
              // the dead cluster has ~zero eligible among its nearest —
              // measured as ~3 escalations per query, 39 s in one task,
              // before this cutover.
              val w = searcher.searchWithEf(qStore, m.snapshot, q, kp0, kp0)
              // queue order is total on (dist, id) — the filtered prefix
              // carries the oracle's tie-breaking
              val hits = w.iterator.filter(nb => eligible(nb.dst)).take(k).toList
              if (hits.length >= k) hits.map(nb => (qid, nb.dst, nb.dist))
              else exactScan(qid, q)
            }
          }
        }
  }

  /** Global top-k merge over per-shard candidates: row_number over the
    * total (dist, id) order — shared by both routing paths so the
    * published result (and its tie-breaking) is path-independent. */
  private def rankMerge(perShard: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))))
      .filter(col("rank") <= k)
  }

  private def searchImpl(index: RoutedIndex, queries: DataFrame, k: Int,
                         nProbe: Int, ef0: Int,
                         allowed: Option[Array[Long]]): DataFrame = {
    val spark = queries.sparkSession
    val cfg = index.cfg
    val router = index.router
    // Exhaustive regime: the probe set covers every primary cell, so
    // predicated serving can GUARANTEE exactness by taking the exact
    // scan in every probed cell (every eligible id lives in exactly one
    // cell, and each cell contributes its true top-k-eligible) — the
    // configuration the hash-oracle rows ride. In the nProbe regime the
    // beam-accept path serves: approximate like the plain kernel, never
    // less accurate than it.
    val exhaustive = nProbe >= router.nPrimary
    val pairEnc = Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)
    // driver-side routing: an ONLINE query batch is tiny next to the
    // corpus and centroids are tiny next to everything — assign each
    // query its probe cells here, invert to cell -> queries, broadcast
    // once. The limit guards the collect: a BATCH query side (the
    // routed tier as one side of a large similarity join) overflows the
    // cutover and reroutes through the distributed path — same kernel,
    // same merge, one extra (wasted) partial collect on the rare
    // crossing rather than a count job on every call.
    val qArr = queries.select(col("qid"), col("qvec"))
      .limit(DriverRouteMax + 1).as(pairEnc).collect()
    if (qArr.length > DriverRouteMax)
      return searchImplDistributed(index, queries, k, nProbe, ef0, allowed)
    val byCell = qArr.iterator.flatMap { case (qid, qv) =>
      router.probeCells(qv, nProbe).map(c => (c, (qid, qv)))
    }.toArray.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val qB = spark.sparkContext.broadcast(byCell)
    // predicate state: both sets ride as sorted primitive arrays (the
    // searchPredicated broadcast shape — O(set), never O(corpus))
    val hasAllow = allowed.nonEmpty
    val allowB = spark.sparkContext.broadcast(allowed.getOrElse(Array.empty[Long]))
    val tombB = spark.sparkContext.broadcast(index.tombstones)
    import spark.implicits._
    val perShard = prunedShards(index.shards, byCell.keys).flatMap { case (_, m) =>
      val probes = qB.value.getOrElse(m.cell, Array.empty[(Long, Array[Float])])
      if (probes.isEmpty) Iterator.empty
      else serveShard(cfg, m, probes.iterator, k, ef0, exhaustive,
        hasAllow, allowB.value, tombB.value)
    }.toDF("qid", "id", "dist")
    rankMerge(perShard, k)
  }

  private[hnsw] def searchImplDistributed(
      index: RoutedIndex, queries: DataFrame, k: Int,
      nProbe: Int, ef0: Int, allowed: Option[Array[Long]]): DataFrame = {
    val spark = queries.sparkSession
    val sc = spark.sparkContext
    val cfg = index.cfg
    val exhaustive = nProbe >= index.router.nPrimary
    val routerB = sc.broadcast(index.router)
    val hasAllow = allowed.nonEmpty
    val allowB = sc.broadcast(allowed.getOrElse(Array.empty[Long]))
    val tombB = sc.broadcast(index.tombstones)
    val pairEnc = Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)
    // zipPartitions needs the query side keyed by the SHARDS' OWN
    // partitioner (an equal-value clone would match keys but not
    // partition COUNT if the shards ever lost theirs) — every
    // build/attach/ingest/compact output pins it, so absence is a
    // construction bug, not a servable state
    val part = index.shards.partitioner.getOrElse(throw new IllegalStateException(
      "distributed routing needs the index's pinned CellPartitioner"))
    // the ONLY shuffle is the query side: fan each query to its probe
    // cells against the broadcast router, key by the pinned cell
    // partitioner — the shard side rides a narrow zipPartitions (the
    // ingest discipline; no shard bytes move)
    val routed = queries.select(col("qid"), col("qvec")).as(pairEnc).rdd
      .flatMap { case (qid, qv) =>
        routerB.value.probeCells(qv, nProbe).map(c => (c, (qid, qv)))
      }.partitionBy(part)
    import spark.implicits._
    val perShard = index.shards.zipPartitions(routed) { (shardIt, qIt) =>
      val shards = shardIt.toArray
      if (shards.length == 0) Iterator.empty
      else if (shards.length == 1) {
        // the pinned partitioner is a cell -> partition bijection, so
        // this is the always-taken branch: STREAM the partition's
        // queries through the kernel — the per-executor bound is the
        // kernel's working set, not the routed query list
        val (cell, m) = shards(0)
        val probes = qIt.collect { case (c, q) if c == cell => q }
        serveShard(cfg, m, probes, k, ef0, exhaustive,
          hasAllow, allowB.value, tombB.value)
      } else {
        // co-located cells (a foreign partitioner only): group, serve each
        val byCell = qIt.toArray.groupBy(_._1)
        shards.iterator.flatMap { case (cell, m) =>
          serveShard(cfg, m,
            byCell.getOrElse(cell, Array.empty).iterator.map(_._2),
            k, ef0, exhaustive, hasAllow, allowB.value, tombB.value)
        }
      }
    }.toDF("qid", "id", "dist")
    rankMerge(perShard, k)
  }

  // --------------------------------------------------------------------
  // Durability: versioned parquet persistence + attach-without-rebuild.
  // --------------------------------------------------------------------

  private val vecRowEnc = Encoders.tuple(
    Encoders.scalaInt, Encoders.scalaLong, ExprEnc.floatArray)

  /** Persist the index under `path` as a new complete version
    * (`idx_v{N}`, `_DONE`-marked last; older versions reclaimed after —
    * the [[VersionedIndexDirs]] discipline: a crash mid-save leaves
    * junk that can never resolve, readers only see complete versions).
    * Six tables: meta (config), centroids (both router levels),
    * vectors, links (per-cell CSR rows), entries, tombstones (the
    * live deletion set — restarts keep serving accepted deletes). */
  def save(index: RoutedIndex, path: String, keepVersions: Int = 1): Unit =
    saveWith(SparkSession.active, index, path, keepVersions)

  private def saveWith(spark: SparkSession, index: RoutedIndex, path: String,
                       keepVersions: Int = 1): Unit = {
    import spark.implicits._
    val dir = VersionedIndexDirs.nextDir(spark, path)
    val cfg = index.cfg
    val p = cfg.params

    Seq((cfg.metric, cfg.seed, p.m.toSeq, p.mMax.toSeq, p.efConstrSearch.toSeq,
        p.efConstrInsert.toSeq, p.efSearch.toSeq, p.layerProbability,
        index.router.nPrimary))
      .toDF("metric", "seed", "m", "m_max", "ef_constr_search",
        "ef_constr_insert", "ef_search", "layer_probability", "n_primary")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")

    RoutedImage.writeRouter(spark, dir, index.router)

    spark.createDataset(index.shards.flatMap { case (cell, s) =>
      s.vectors.iterator.map { case (id, v) => (cell, id, v) }
    })(vecRowEnc).toDF("cell", "id", "vec")
      .write.mode("overwrite").parquet(s"$dir/vectors")

    RoutedImage.writeGraph(spark, dir, index.shards,
      (s: CellShard) => s.snapshot)
    RoutedImage.writeTombstones(spark, dir, index.tombstones)

    // completeness marker LAST; then reclaim superseded/junk versions
    VersionedIndexDirs.commit(spark, path, dir, keepVersions)
  }

  /** Restore a saved index WITHOUT rebuilding: read the newest complete
    * version, reassemble per-cell snapshots with one co-partitioned
    * cogroup (the attach cost is a parquet scan + CSR assembly — no
    * k-means, no HNSW construction; measured ≫ cheaper than build). */
  def attach(spark: SparkSession, path: String,
             persist: Boolean = true): RoutedIndex = {
    val dir = VersionedIndexDirs.newestDone(spark, path)

    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val params = RoutedImage.paramsFromMeta(meta)
    val cfg = BuildConfig(params, meta.getAs[String]("metric"),
      meta.getAs[Long]("seed"))
    val router = RoutedImage.readRouter(spark, dir, cfg.metric)

    val part = partitionerFor(router)
    val vecs = spark.read.parquet(s"$dir/vectors")
      .select(col("cell"), col("id"), col("vec")).as(vecRowEnc).rdd
      .map { case (c, id, v) => (c, (id, v)) }
    val links = RoutedImage.readLinks(spark, dir)
    val entries = RoutedImage.readEntries(spark, dir)

    // preservesPartitioning: the restored shards must keep the pinned
    // partitioner, or the first post-attach ingest would shuffle the
    // whole INDEX side to co-locate with its batch — exactly the move
    // the keyed-shard design exists to avoid
    val shards = vecs.cogroup(links, entries, part).mapPartitions({ it =>
      it.map { case (cell, (vs, ls, es)) =>
        cell -> CellShard(cell, LongVecMap.from(vs.iterator),
          RoutedImage.assembleSnapshot(ls, es))
      }
    }, preservesPartitioning = true)
    if (persist) {
      shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-routed")
      shards.count()
    }
    RoutedIndex(cfg, router, shards, RoutedImage.readTombstones(spark, dir))
  }

  /** Process-wide memo (the shardCache pattern), keyed by app id so a
    * handle of a stopped SparkContext is never served. NOT
    * computeIfAbsent: the lifecycle handles nest (compactCached →
    * deleteCached → buildCached), and nested computeIfAbsent on one
    * ConcurrentHashMap throws "Recursive update" — get/putIfAbsent
    * trades atomic insertion (never contended here: the catalog serves
    * queries sequentially) for safe nesting. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, RoutedIndex]()

  /** Release every memoized handle (see [[IndexCaches]]). Lifecycle
    * handles SHARE shard RDDs (deleteCached wraps buildCached's), so
    * double-unpersist is possible and harmless (idempotent). */
  private[hnsw] def releaseCaches(): Unit = {
    cache.values.forEach(_.unpersist())
    cache.clear()
  }

  private def memo(key: String)(mk: => RoutedIndex): RoutedIndex = {
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val v = mk
      val prev = cache.putIfAbsent(key, v)
      // losing the (theoretical) race leaves v's shards persisted and
      // materialized but unreachable — release them, don't leak the
      // executor storage pool
      if (prev != null) { v.unpersist(); prev } else v
    }
  }

  def buildCached(vectors: DataFrame, cfg: BuildConfig, nCells: Int,
                  key: String): RoutedIndex =
    memo(
      s"${vectors.sparkSession.sparkContext.applicationId}|$key|$nCells|" +
        HnswDistributed.cacheKey(cfg))(
      graft.BuildLedger.timed("hnsw_routed_build")(
        build(vectors, cfg, nCells)))

  /** Memoized build-then-ingest — the catalog's incremental-growth
    * handle: the base corpus builds, the tail INGESTS (per-cell merge
    * into live graphs), and the serving result is held to the same
    * exhaustive-regime oracle as a from-scratch build. */
  def growCached(baseVectors: DataFrame, newRows: DataFrame,
                 cfg: BuildConfig, nCells: Int, key: String): RoutedIndex =
    memo(
      s"${baseVectors.sparkSession.sparkContext.applicationId}|grow|$key|" +
        s"$nCells|${HnswDistributed.cacheKey(cfg)}")(
      graft.BuildLedger.timed("hnsw_routed_grow") {
        ingest(build(baseVectors, cfg, nCells), newRows)
      })

  /** Memoized save+attach round-trip of a built index — the catalog's
    * durable-tier serving handle (built once, persisted once, served
    * from the ATTACHED copy so the oracle rides the restore path). */
  def attachCached(vectors: DataFrame, cfg: BuildConfig, nCells: Int,
                   key: String): RoutedIndex =
    memo(
      s"${vectors.sparkSession.sparkContext.applicationId}|attach|$key|" +
        s"$nCells|${HnswDistributed.cacheKey(cfg)}")(
      graft.BuildLedger.timed("hnsw_routed_save_attach") {
        val built = buildCached(vectors, cfg, nCells, key)
        val dir = graft.TempDirs.create("graft_routed_")
        saveWith(vectors.sparkSession, built, dir)
        attach(vectors.sparkSession, dir)
      })

  /** Memoized tombstone-serving handle: [[delete]] over the SHARED
    * cached build — delete is O(set) handle metadata, so the catalog's
    * tombstone row serves from the same shards as its plain-search
    * twin, paying only the deletion-set collect once. */
  def deleteCached(vectors: DataFrame, deleted: DataFrame,
                   cfg: BuildConfig, nCells: Int, key: String,
                   delKey: String): RoutedIndex =
    memo(
      s"${vectors.sparkSession.sparkContext.applicationId}|tomb|$key|" +
        s"$delKey|$nCells|${HnswDistributed.cacheKey(cfg)}")(
      delete(buildCached(vectors, cfg, nCells, key), deleted))

  /** Memoized retrain of the cached grown index — the drift-recovery
    * handle: the grown corpus re-routes through a freshly trained
    * quantizer (built from the index's own shards; the grown handle
    * keeps serving its rows). */
  def retrainCached(baseVectors: DataFrame, newRows: DataFrame,
                    cfg: BuildConfig, nCells: Int, key: String): RoutedIndex =
    memo(
      s"${baseVectors.sparkSession.sparkContext.applicationId}|retrain|$key|" +
        s"$nCells|${HnswDistributed.cacheKey(cfg)}")(
      graft.BuildLedger.timed("hnsw_routed_retrain") {
        retrain(growCached(baseVectors, newRows, cfg, nCells, key))
      })

  /** Memoized compaction of the cached tombstoned index — the deletion
    * set folded OUT of the graphs (affected cells rebuilt, untouched
    * cells pass through by reference). `unpersistPrior = false`: the
    * prior shards are the shared cached build, still serving the
    * plain/tombstone rows. */
  def compactCached(vectors: DataFrame, deleted: DataFrame,
                    cfg: BuildConfig, nCells: Int, key: String,
                    delKey: String): RoutedIndex =
    memo(
      s"${vectors.sparkSession.sparkContext.applicationId}|compact|$key|" +
        s"$delKey|$nCells|${HnswDistributed.cacheKey(cfg)}")(
      graft.BuildLedger.timed("hnsw_routed_compact") {
        compact(deleteCached(vectors, deleted, cfg, nCells, key, delKey),
          unpersistPrior = false)
      })
}
