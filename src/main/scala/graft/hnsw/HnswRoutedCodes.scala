package graft.hnsw

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.store.{GraphSnapshot, InMemoryGraph}

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
  * (`h_knn_routed_hamming`). */
object HnswRoutedCodes {

  final case class CodeCellShard(
      cell: Int,
      codes: LongLongMap,
      snapshot: GraphSnapshot) extends Serializable

  final case class RoutedCodeIndex(
      params: HnswParams,
      seed: Long,
      anchors: Array[Long],
      shards: org.apache.spark.rdd.RDD[(Int, CodeCellShard)]) {
    def unpersist(): Unit = shards.unpersist()
  }

  private val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

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

    var anchors = Array.tabulate(math.min(nCells, sample.length)) { i =>
      sample(((HnswSearcher.uniformFromHash(i.toLong, seed) * sample.length).toInt)
        .min(sample.length - 1))
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

  /** Per-cell row budget (see [[HnswRouted.DefaultMaxCellRows]]): codes
    * are 8 B/row, so the budget here bounds GRAPH memory (edges), not
    * vector memory — the same 4M default keeps a cell's layer-0 arrays
    * ~1 GiB at mMax=32. */
  val DefaultMaxCellRows = 4000000L

  def build(codes: DataFrame, params: HnswParams = HnswParams.standard(64, 32, 32),
            nCells: Int = 16, seed: Long = 42L, persist: Boolean = true,
            maxCellRows: Long = DefaultMaxCellRows): RoutedCodeIndex = {
    val spark = codes.sparkSession
    // global id dedup (deterministic survivor: max code)
    val deduped = codes.select(col("id"), col("code"))
      .groupBy(col("id")).agg(max(col("code")).as("code"))
    val anchors = trainAnchors(deduped, nCells, seed)
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
      val searcher = new HnswSearcher(params)
      byCell.iterator.map { case (cell, buf) =>
        val rows = buf.toArray.sortBy(_._1)
        val store = new CellCodeStore(LongLongMap.from(rows.iterator, rows.length))
        val graph = new InMemoryGraph
        rows.foreach { case (id, _) =>
          searcher.insert(store, graph, id, searcher.selectLayerByHash(id, seed))
        }
        cell -> CodeCellShard(cell, store.codes, graph.snapshot)
      }
    }, preservesPartitioning = true)
    if (persist) {
      shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-routed-codes")
      shards.count()
    }
    RoutedCodeIndex(params, seed, anchors, shards)
  }

  /** Routed Hamming k-NN: (qid, qcode) -> (qid, id, hamming, rank) —
    * the flat tier's output contract ([[HnswCodes.search]]). ef0
    * follows the float tier's density-adaptive default
    * ([[HnswRouted.autoEf]]); explicit ef0 pins the in-cell beam. */
  def search(index: RoutedCodeIndex, queries: DataFrame, k: Int,
             nProbe: Int, ef0: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val params = index.params
    val qArr = queries.select(col("qid"), col("qcode")).as(pairEnc).collect()
    val anchors = index.anchors
    val p = math.min(nProbe, anchors.length)
    val byCell = qArr.iterator.flatMap { case (qid, qc) =>
      val byDist = Array.tabulate(anchors.length)(a => (a, hamming(qc, anchors(a))))
      java.util.Arrays.sort(byDist,
        Ordering.by[(Int, Int), (Int, Int)](x => (x._2, x._1)))
      byDist.iterator.take(p).map { case (c, _) => (c, (qid, qc)) }
    }.toArray.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val qB = spark.sparkContext.broadcast(byCell)
    import spark.implicits._
    val perShard = index.shards.flatMap { case (_, m) =>
      val probes = qB.value.getOrElse(m.cell, Array.empty[(Long, Long)])
      if (probes.isEmpty) Iterator.empty
      else {
        val searcher = new HnswSearcher(params)
        val store = new CellCodeStore(m.codes)
        val base = params.getEfSearch(0)
        val ef = if (ef0 > 0) math.max(ef0, base)
                 else HnswRouted.autoEf(base, m.codes.size)
        probes.iterator.flatMap { case (qid, qc) =>
          store.stage(-1L, qc)
          searcher.searchWithEf(store, m.snapshot, -1L, k, ef)
            .iterator.map(nb => (qid, nb.dst, nb.dist.toInt))
        }
      }
    }.toDF("qid", "id", "hamming")

    import org.apache.spark.sql.expressions.Window
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("hamming"), col("id"))))
      .filter(col("rank") <= k)
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

  def buildCached(codes: DataFrame, params: HnswParams, nCells: Int,
                  seed: Long, key: String): RoutedCodeIndex =
    cache.computeIfAbsent(
      Seq(codes.sparkSession.sparkContext.applicationId, key, nCells, seed,
        params.m.toList, params.mMax.toList, params.efConstrSearch.toList,
        params.efConstrInsert.toList, params.efSearch.toList,
        params.layerProbability).mkString("|"),
      _ => graft.BuildLedger.timed("hnsw_routed_codes_build")(
        build(codes, params, nCells, seed)))
}
