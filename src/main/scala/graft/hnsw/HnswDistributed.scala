package graft.hnsw

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{ArrayVectorStore, GraphSnapshot, InMemoryGraph, Metrics}

/** A built HNSW index ready for distributed search: the (small, broadcast-
  * able) layered graph plus the vector table keyed by id. At broadcast
  * scale both ship to every executor once; beyond that, shard with
  * [[HnswDistributed.buildSharded]] (independent per-shard graphs + top-k
  * merge — the 100 TB path, where each shard holds only its partition's
  * vectors and graph).
  */
final case class HnswModel(
    params: HnswParams,
    metricName: String,
    snapshot: GraphSnapshot,
    // the primitive LongVecMap, not a scala map: the model BROADCASTS
    // (Kryo-serialized torrent blocks), and scala's mutable.LongMap
    // deserialized corrupt under that round-trip in cached shard state
    // (the round-16 PQ-tier SIGSEGV — see LongVecMap's scaladoc); it is
    // also the no-boxed-lookup shape every distance eval wants
    vectors: LongVecMap
) extends Serializable {
  def size: Int = vectors.size
}

/** Distributed HNSW build & search over DataFrames.
  *
  * Build (S10 batched): the reference inserts one vector at a time, each
  * insert reading the graph built by all previous ones
  * (hawk_searcher.rs:311-332). The batch-parallel variant processes
  * micro-batches: phase 1 (search_to_insert, read-only — the expensive
  * part) runs data-parallel on executors against a broadcast snapshot of
  * the current graph; phase 2 (connect_bidir mutations) applies the batch
  * results in deterministic id order. Same-batch vectors don't see each
  * other during phase 1, so batch size is capped at the current graph size
  * (each node always links into a graph at least as large as its batch) —
  * the standard recall/parallelism tradeoff of distributed HNSW builds,
  * measured against the exact oracle in the test suite.
  *
  * Determinism: layer assignment is hash-based (S3,
  * [[HnswSearcher.selectLayerByHash]]), batches are id-ordered, and all
  * queue orders are total — the same input yields bit-identical graphs
  * regardless of cluster layout.
  */
object HnswDistributed {

  /** `growthDenom`/`batchCeiling` govern the geometric batch schedule
    * past `maxBatch` (batch = min(pos/growthDenom, batchCeiling)): they
    * change the built graph (stale-snapshot fraction per batch is
    * 1/growthDenom), so they are explicit config — and part of
    * [[cacheKey]] — rather than loop constants. */
  final case class BuildConfig(
      params: HnswParams = HnswParams.standard(64, 32, 32),
      metric: String = "cosine",
      seed: Long = 42L,
      seedBatch: Int = 128,
      maxBatch: Int = 4096,
      growthDenom: Int = 4,
      batchCeiling: Int = 262144
  )

  private val pairEnc = Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)

  /** Process-wide model memo: catalog queries over the same static table
    * + config share one build (the model is pure data — no session refs). */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, HnswModel]()

  /** Full-config memo key: every field that can change the built graph
    * (all five param arrays, layerProbability, metric, seed, batching). */
  private[hnsw] def cacheKey(cfg: BuildConfig): String = {
    val p = cfg.params
    Seq(cfg.metric, cfg.seed, cfg.seedBatch, cfg.maxBatch,
      cfg.growthDenom, cfg.batchCeiling,
      p.m.toList, p.mMax.toList, p.efConstrSearch.toList,
      p.efConstrInsert.toList, p.efSearch.toList, p.layerProbability
    ).mkString("|")
  }

  def buildCached(vectors: DataFrame, cfg: BuildConfig, key: String): HnswModel =
    modelCache.computeIfAbsent(s"$key|${cacheKey(cfg)}", _ =>
      graft.BuildLedger.timed(s"hnsw_build_ef${cfg.params.efSearch.head}")(
        build(vectors, cfg)))

  /** Build from a (id: long, vec: array<float>) DataFrame. */
  def build(vectors: DataFrame, cfg: BuildConfig = BuildConfig()): HnswModel = {
    val spark = vectors.sparkSession
    val rows = vectors.select(col("id"), col("vec"))
      .as(pairEnc).collect().sortBy(_._1)
    buildFromArray(spark, rows, cfg)
  }

  def buildFromArray(spark: SparkSession, rows0: Array[(Long, Array[Float])],
                     cfg: BuildConfig): HnswModel = {
    // duplicate ids would double-insert (rows0.toMap collapses silently
    // while the insertion loop runs per ROW, linking a vertex to itself
    // and inflating its degree) — keep the first occurrence
    val rows = rows0.distinctBy(_._1)
    val metric = Metrics.byName(cfg.metric)
    val searcher = new HnswSearcher(cfg.params)
    // primitive-keyed: this map backs EVERY distance eval of the build
    // (executor-side through the broadcast payload, driver-side in the
    // merge) — a boxed trie here costs a Long box + trie walk per eval
    val vecMap = LongVecMap.from(rows.iterator, rows.length)
    val store = new ArrayVectorStore(metric, base = vecMap)
    rows.foreach { case (id, v) => store.prepareQueryWithId(id, v) }
    val graph = new InMemoryGraph
    val insLayers = rows.map { case (id, _) => searcher.selectLayerByHash(id, cfg.seed) }

    batchedBuildLoop(spark, rows.map(_._1), insLayers, vecMap,
      (m: LongVecMap) => new ArrayVectorStore(metric, base = m),
      store, searcher, graph, cfg.seedBatch, cfg.maxBatch,
      cfg.growthDenom, cfg.batchCeiling)

    HnswModel(cfg.params, cfg.metric, graph.snapshot, vecMap)
  }

  /** The shared seed + micro-batched build loop over any broadcastable
    * store payload (float vectors here, u64 codes in
    * [[HnswCodes.buildBatched]]): strictly sequential seed inserts, then
    * per batch a distributed phase-1 search_to_insert against a
    * broadcast snapshot and an id-ordered driver-side phase-2 merge
    * (set_ep recomputed against the live graph — another same-batch
    * element may have raised the top layer). Batch size is capped at the
    * current graph size. */
  private[hnsw] def batchedBuildLoop[P: scala.reflect.ClassTag](
      spark: SparkSession,
      ids: Array[Long], insLayers: Array[Int],
      payload: P, mkExecutorStore: P => graft.store.VectorStore,
      driverStore: graft.store.VectorStore, searcher: HnswSearcher,
      graph: InMemoryGraph, seedBatch: Int, maxBatch: Int,
      growthDenom: Int = 4, batchCeiling: Int = 262144): Unit = {
    require(growthDenom >= 1, "growthDenom must be >= 1")
    val n = ids.length
    // Fail FAST on the broadcast tier's hard envelope instead of 20+
    // minutes into the build: Kryo's Unsafe bulk writer takes an int
    // BYTE count, so any single primitive array over ~2 GiB
    // (layer-0 dsts/dists at ~2.7e8 edges) dies in copyMemoryChecks at
    // the first over-sized snapshot broadcast — measured at n=1e7,
    // m=32: 23 min of build, then KryoException. The bound below is
    // edges <= n * mMax0, reached in practice (HNSW fills degrees).
    // Graphs past it belong on the tiers built for that scale:
    // buildSharded / HnswRouted (per-cell graphs under the wall) or
    // HnswDurable (no full-graph broadcast at all).
    // Documented tradeoff (round-11 advice): this is a WORST-CASE edge
    // bound — a sparse borderline graph whose actual layer-0 edge count
    // would land under the wall is rejected where it might have
    // completed. Accepted deliberately: "sometimes dies 23 minutes in,
    // depending on degree fill" is not an envelope a user can plan
    // around, and the escape hatch is zero-risk — the sharded/routed/
    // durable tiers named in the message serve the same index contract.
    val maxEdges = n.toLong * searcher.params.mMax.max
    require(maxEdges * 8L <= Int.MaxValue.toLong,
      s"single-graph broadcast build envelope exceeded: n=$n x mMax0=" +
        s"${searcher.params.mMax.max} bounds ${maxEdges} layer-0 edges, whose " +
        "8-byte columns pass Kryo's 2 GiB per-array serialization limit. " +
        "Use HnswDistributed.buildSharded, HnswRouted.build, or " +
        "HnswDurable.ingest for graphs of this size.")
    val seedN = math.min(seedBatch, n)
    var pos = 0
    while (pos < seedN) {
      searcher.insert(driverStore, graph, ids(pos), insLayers(pos))
      pos += 1
    }

    val sc = spark.sparkContext
    // phase breakdown (driver-side attribution; printed only when
    // GRAFT_BUILD_PHASES=true in the env): snapshot+broadcast /
    // distributed phase 1 / sequential phase-2 merge — the Amdahl
    // split of this build shape
    var tSnap, tBcast, tPhase1, tMerge = 0L
    def now() = System.nanoTime()
    // broadcasts released on EVERY path: a transient job failure with a
    // catch-and-retry caller would otherwise leak one full-graph
    // snapshot + the whole vector payload per attempt
    val payloadB = sc.broadcast(payload)
    try {
      while (pos < n) {
        // Batch schedule: min(maxBatch, pos) early (never insert more
        // than the built prefix at once — intra-batch nodes can't link
        // to each other in phase 1), then GROWING with the prefix
        // (pos/growthDenom) once past maxBatch. A fixed cap
        // re-broadcasts the full O(n) snapshot every maxBatch inserts —
        // Σ O(n²/maxBatch) bytes, measured 40x-superlinear at n=1e6
        // (396 s, ~250 broadcasts of a ~130 MB-avg snapshot); the
        // geometric schedule needs O(log n) broadcasts, Σ ~5x the final
        // snapshot. The stale-snapshot fraction stays <= 1/growthDenom
        // past the cap (it is 1.0 during the early doubling phase the
        // parity specs pin; the grown-regime cross-query recall floor
        // is pinned by its own spec), and the batchCeiling bounds the
        // driver-side phase-1 result collect regardless of n.
        val grown = math.max(maxBatch, math.min(pos / growthDenom, batchCeiling))
        val batchSize = math.min(math.min(grown, pos), n - pos)
        val batch = (pos until pos + batchSize).map(i => (ids(i), insLayers(i)))
        val t0 = now()
        val snap = graph.snapshot
        val tMid = now()
        tSnap += tMid - t0
        val snapB = sc.broadcast(snap)
        tBcast += now() - tMid
        val results =
          try {
            val slices = math.max(1, math.min(batch.size / 16, sc.defaultParallelism))
            val t1 = now()
            val r = sc.parallelize(batch, slices).mapPartitions { it =>
              val localStore = mkExecutorStore(payloadB.value)
              val snap = snapB.value
              it.map { case (id, insLayer) =>
                val (links, _) = searcher.searchToInsert(localStore, snap, id, insLayer)
                (id, links.map(_.toArray))
              }
            }.collect()
            tPhase1 += now() - t1
            r
          } finally snapB.destroy()

        val t2 = now()
        results.sortBy(_._1).foreach { case (id, linkArrays) =>
          val links = linkArrays.map(a => FurthestQueue.fromAscending(a.toSeq))
          val setEp = links.size > graph.numLayers
          driverStore.insert(id)
          searcher.insertFromSearchResults(driverStore, graph, id, links, setEp)
        }
        tMerge += now() - t2
        pos += batchSize
      }
    } finally {
      payloadB.destroy()
      if (sys.env.get("GRAFT_BUILD_PHASES").contains("true"))
        System.err.println(
          f"build phases: snapshot ${tSnap / 1e9}%.2fs bcast ${tBcast / 1e9}%.2fs " +
            f"phase1 ${tPhase1 / 1e9}%.2fs merge ${tMerge / 1e9}%.2fs")
    }
  }

  /** Distributed k-NN search (S6): broadcast the model, run the
    * executor-local kernel per query partition. Output:
    * (qid, id, dist, rank) — shuffle-free except the caller's own sinks;
    * cost O(|queries| x ef x log n) instead of the exact path's full scan.
    *
    * Broadcasting the model is O(index size): serving workloads should
    * broadcast once via [[broadcastModel]] and reuse the handle across
    * query batches ([[searchBroadcast]]).
    */
  def search(queries: DataFrame, model: HnswModel, k: Int): DataFrame =
    searchBroadcast(queries, broadcastModel(queries.sparkSession, model), k)

  def broadcastModel(spark: SparkSession,
                     model: HnswModel): org.apache.spark.broadcast.Broadcast[HnswModel] =
    spark.sparkContext.broadcast(model)

  def searchBroadcast(queries: DataFrame,
                      modelB: org.apache.spark.broadcast.Broadcast[HnswModel],
                      k: Int): DataFrame = {
    val resEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaDouble, Encoders.scalaInt)
    queries.select(col("qid"), col("qvec")).as(pairEnc)
      .mapPartitions { it =>
        val m = modelB.value
        val metric = Metrics.byName(m.metricName)
        val searcher = new HnswSearcher(m.params)
        // one store per PARTITION, re-staging the -1 query slot per row
        // (the HnswCodes pattern) — per-row construction is avoidable
        // allocation on the serving hot path
        val store = new ArrayVectorStore(metric, base = m.vectors)
        it.flatMap { case (qid, qvec) =>
          val q = store.prepareQueryWithId(-1L, qvec)
          val w = searcher.search(store, m.snapshot, q, k)
          w.iterator.zipWithIndex.map { case (nb, i) => (qid, nb.dst, nb.dist, i + 1) }
        }
      }(resEnc)
      .toDF("qid", "id", "dist", "rank")
  }

  /** Attribute-filtered k-NN: top-k among only the vectors whose id is in
    * `allowed` — the "WHERE label = x" companion of vector search, which
    * plain post-filtering of a k-sized result silently under-returns.
    *
    * Strategy: overfetch-with-escalation, executor-local. Each query
    * searches k' >> k (widening only the layer-0 beam via
    * [[HnswSearcher.searchWithEf]]), keeps the allowed hits, and grows
    * k' 4x until it has k of them or the beam spans the whole index (at
    * which point the filtered prefix is exhaustive). In the exact-regime
    * configuration the index returns the true top-k' ranking, so the
    * allowed prefix is the true filtered top-k — the property the exact
    * DuckDB oracle checks end-to-end. Escalation is per-query and local:
    * no driver round-trips, no extra shuffles; selective predicates cost
    * proportionally wider beams only for the queries that need them.
    *
    * The allowed set rides in its own broadcast as a sorted primitive
    * array (8 bytes/id, binary-search membership) — at serving scale this
    * is the id-list of a label partition, shipped once per executor like
    * the model itself.
    */
  def searchFiltered(queries: DataFrame, model: HnswModel,
                     allowed: DataFrame, k: Int): DataFrame =
    searchPredicated(queries, model, allowed, negate = false, k)

  /** Tombstone serving: k-NN over the index EXCLUDING a deletion set —
    * delete-without-rebuild. Only the (small) deleted-id set is
    * broadcast, never its corpus-sized complement; the traversal is
    * unchanged and tombstoned vertices still conduct the walk (their
    * edges remain — the standard soft-delete posture until the next
    * compaction rebuilds without them). */
  def searchExcluding(queries: DataFrame, model: HnswModel,
                      deleted: DataFrame, k: Int): DataFrame =
    searchPredicated(queries, model, deleted, negate = true, k)

  /** Shared overfetch loop behind [[searchFiltered]] (membership = in
    * `ids`) and [[searchExcluding]] (membership = NOT in `ids`). */
  private def searchPredicated(queries: DataFrame, model: HnswModel,
                               idsDf: DataFrame, negate: Boolean,
                               k: Int): DataFrame = {
    val spark = queries.sparkSession
    val idsSorted: Array[Long] = idsDf
      .select(col(idsDf.columns.head).cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idsB = spark.sparkContext.broadcast(idsSorted)
    val modelB = broadcastModel(spark, model)
    val resEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaDouble, Encoders.scalaInt)
    queries.select(col("qid"), col("qvec")).as(pairEnc)
      .mapPartitions { it =>
        val m = modelB.value
        val metric = Metrics.byName(m.metricName)
        val searcher = new HnswSearcher(m.params)
        val ids = idsB.value
        def eligible(id: Long): Boolean = {
          val in = java.util.Arrays.binarySearch(ids, id) >= 0
          if (negate) !in else in
        }
        // one store per partition, -1 query slot re-staged per row
        val store = new ArrayVectorStore(metric, base = m.vectors)
        it.flatMap { case (qid, qvec) =>
          val q = store.prepareQueryWithId(-1L, qvec)
          val n = m.size
          var kp = math.max(4 * k, m.params.getEfSearch(0))
          var out: List[(Long, Long, Double, Int)] = Nil
          var done = n == 0 || (!negate && ids.isEmpty)
          while (!done) {
            val w = searcher.searchWithEf(store, m.snapshot, q, kp, kp)
            val hits = w.iterator.filter(nb => eligible(nb.dst)).take(k).toList
            if (hits.length >= k) {
              out = hits.zipWithIndex.map { case (nb, i) =>
                (qid, nb.dst, nb.dist, i + 1)
              }
              done = true
            } else if (kp >= n) {
              // the beam spanned the whole index and still came up short.
              // A graph WALK can never surface a vertex that lost every
              // in-edge to M_max re-trimming (rare but possible), so an
              // ef=n beam is not a completeness proof — finish with an
              // exact executor-local scan over the eligible ids:
              // O(|eligible|) distance evals, still no driver round-trip,
              // and the result provably matches the filtered oracle.
              val eligibleIter =
                if (negate) m.vectors.keysIterator.filter(eligible)
                else ids.iterator.filter(m.vectors.contains)
              val exact = eligibleIter
                .map(id => (id, store.evalDistance(q, id))).toArray
              out = exact.sortBy { case (id, d) => (d, id) }.take(k)
                .zipWithIndex
                .map { case ((id, d), i) => (qid, id, d, i + 1) }.toList
              done = true
            } else kp = math.min(n.toLong, kp.toLong * 4L).toInt // long math: no Int wrap before the clamp
          }
          out
        }
      }(resEnc)
      .toDF("qid", "id", "dist", "rank")
  }

  /** Self-match check (S11 over the whole store): search every persisted
    * vector with k=1 and test the nearest hit against the store's match
    * threshold — the e2e invariant of the reference test suite
    * (hawk_searcher.rs:441-479). Returns (id, matched). */
  def selfMatch(vectors: DataFrame, model: HnswModel,
                matchThreshold: Double): DataFrame = {
    val withQ = vectors.select(col("id").as("qid"), col("vec").as("qvec"))
    search(withQ, model, 1)
      .select(col("qid").as("id"), (col("dist") <= matchThreshold).as("matched"))
  }

  /** One shard of a sharded index: the shard's own vectors + graph, held
    * executor-side inside a persisted RDD — the serving handle never
    * routes through the driver. */
  final case class ShardModel(
      // LongVecMap, not a scala map — the shard RDD persists (memory
      // spilling to disk) through Encoders.kryo, the round-trip that
      // corrupted scala LongMap state (see LongVecMap's scaladoc)
      vectors: LongVecMap,
      snapshot: GraphSnapshot
  ) extends Serializable

  /** A prebuilt sharded index: build once, serve many query batches. The
    * shard RDD is persisted (memory, spilling to disk) so repeated
    * searches pay zero rebuild — the serving shape the single-fused
    * [[buildShardedAndSearch]] cannot offer. */
  final case class ShardedIndex(cfg: BuildConfig,
                                shards: org.apache.spark.rdd.RDD[ShardModel]) {
    def unpersist(): Unit = shards.unpersist()
  }

  /** The beyond-broadcast path: build one independent HNSW per shard of
    * the vector table inside mapPartitions (no driver round-trips, no
    * cross-shard traffic). Linear in #shards but each shard is
    * sub-linear — at 1000 executors the scan-vs-graph gap stays. */
  def buildSharded(vectors: DataFrame, cfg: BuildConfig = BuildConfig(),
                   numShards: Int = 0, persist: Boolean = true): ShardedIndex = {
    val spark = vectors.sparkSession
    val nShards = if (numShards > 0) numShards else spark.sparkContext.defaultParallelism
    val shards = vectors.select(col("id"), col("vec"))
      .repartition(nShards, col("id"))
      .as(pairEnc)
      .mapPartitions { it =>
        val shard = it.toArray.sortBy(_._1)
        if (shard.isEmpty) Iterator.empty
        else {
          val metric = Metrics.byName(cfg.metric)
          val searcher = new HnswSearcher(cfg.params)
          val vecMap = LongVecMap.from(shard.iterator, shard.length)
          val store = new ArrayVectorStore(metric, base = vecMap)
          shard.foreach { case (id, v) => store.prepareQueryWithId(id, v) }
          val graph = new InMemoryGraph
          shard.foreach { case (id, _) =>
            searcher.insert(store, graph, id, searcher.selectLayerByHash(id, cfg.seed))
          }
          Iterator.single(ShardModel(vecMap, graph.snapshot))
        }
      }(Encoders.kryo[ShardModel])
      .rdd
    if (persist) {
      shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-shards")
      shards.count() // materialize the build eagerly
    }
    ShardedIndex(cfg, shards)
  }

  /** Search a prebuilt sharded index: every shard answers top-k from its
    * own graph, then a tiny global top-k merge (k rows per query x shard).
    * Returns (qid, id, dist, rank). Each call broadcasts its (small)
    * query batch; Spark's ContextCleaner reclaims those broadcasts when
    * the returned frame is no longer referenced. */
  def searchSharded(index: ShardedIndex, queries: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val cfg = index.cfg
    val qB = spark.sparkContext.broadcast(
      queries.select(col("qid"), col("qvec")).as(pairEnc).collect())
    import spark.implicits._
    val perShard = index.shards.flatMap { m =>
      val metric = Metrics.byName(cfg.metric)
      val searcher = new HnswSearcher(cfg.params)
      // one store per shard, -1 query slot re-staged per query
      val qStore = new ArrayVectorStore(metric, base = m.vectors)
      qB.value.iterator.flatMap { case (qid, qvec) =>
        val q = qStore.prepareQueryWithId(-1L, qvec)
        val w = searcher.search(qStore, m.snapshot, q, k)
        w.iterator.map(nb => (qid, nb.dst, nb.dist))
      }
    }.toDF("qid", "id", "dist")

    import org.apache.spark.sql.expressions.Window
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))))
      .filter(col("rank") <= k)
  }

  /** Process-wide sharded-index memo (the modelCache pattern): catalog
    * queries over the same static table + config share one build. */
  private val shardCache =
    new java.util.concurrent.ConcurrentHashMap[String, ShardedIndex]()

  def buildShardedCached(vectors: DataFrame, cfg: BuildConfig,
                         numShards: Int, key: String): ShardedIndex =
    // keyed by applicationId too: the cached handle wraps an RDD bound
    // to the creating SparkContext — a later session in the same JVM
    // must not receive a handle of a stopped context
    shardCache.computeIfAbsent(
      s"${vectors.sparkSession.sparkContext.applicationId}|$key|$numShards|${cacheKey(cfg)}",
      _ => graft.BuildLedger.timed("hnsw_sharded_build")(
        buildSharded(vectors, cfg, numShards)))

  /** Broadcast-tier twin of `ParquetGraphStore.compactTombstones`: fold a
    * deletion set OUT of a built model — the relational links-out pass
    * ([[GraphFrames.compactTombstones]]) over the model's graph, entry
    * repair if the entry point was deleted (highest surviving layer,
    * lowest id), and the deleted vectors dropped from the broadcast map.
    * The compaction contract: searching the result with NO exclusion set
    * equals [[searchExcluding]] on the original model — pinned by the
    * h_knn_compacted catalog oracle and TombstoneCompactionSpec. */
  def compactModel(model: HnswModel, deleted: DataFrame): HnswModel = {
    val spark = deleted.sparkSession
    import spark.implicits._
    val delIds = deleted
      .select(col(deleted.columns.head).cast("long")).as[Long].collect().toSet
    val survivors = new LongVecMap(model.vectors.size)
    model.vectors.foreach { case (id, v) =>
      if (!delIds.contains(id)) survivors.put(id, v)
    }
    val vecsDf = survivors.iterator.toSeq.toDF("id", "vec")
    val compacted = GraphFrames.compactTombstones(
      GraphFrames.toLinksDF(spark, model.snapshot), deleted, vecsDf,
      model.metricName, model.params)
      // materialize once: the entry-repair probe and fromLinksDF's
      // collect would otherwise each re-run the whole compaction job
      // (broadcast tier — the graph is driver-sized by definition)
      .localCheckpoint()
    val entry = model.snapshot.entryPoint
      .filterNot(ep => delIds.contains(ep.point))
      .orElse {
        compacted.orderBy(desc("layer"), asc("src"))
          .select(col("src"), col("layer")).limit(1).collect()
          .headOption.map(r => graft.store.EntryPoint(r.getLong(0), r.getInt(1)))
      }
    val snap = GraphFrames.fromLinksDF(compacted, entry)
    compacted.unpersist(blocking = false)
    HnswModel(model.params, model.metricName, snap, survivors)
  }

  /** Process-wide compacted-model memo (the modelCache pattern; the
    * caller's key must identify model + deletion set). */
  private val compactCache =
    new java.util.concurrent.ConcurrentHashMap[String, HnswModel]()

  /** Release every memoized handle (see [[IndexCaches]]): persisted
    * shard RDDs unpersist, model maps clear — a later re-hit rebuilds. */
  private[hnsw] def releaseCaches(): Unit = {
    shardCache.values.forEach(_.unpersist())
    shardCache.clear()
    modelCache.clear()
    compactCache.clear()
  }

  def compactModelCached(model: HnswModel, deleted: DataFrame,
                         key: String): HnswModel =
    compactCache.computeIfAbsent(key, _ =>
      graft.BuildLedger.timed("hnsw_compact")(compactModel(model, deleted)))

  /** Fused build+search — batch-only convenience over [[buildSharded]] +
    * [[searchSharded]]; serving workloads should hold the
    * [[ShardedIndex]] handle and call [[searchSharded]] per batch. */
  def buildShardedAndSearch(vectors: DataFrame, queries: DataFrame, k: Int,
                            cfg: BuildConfig = BuildConfig(),
                            numShards: Int = 0): DataFrame = {
    // one-shot: build+search fuse into a single pass, nothing cached
    val index = buildSharded(vectors, cfg, numShards, persist = false)
    searchSharded(index, queries, k)
  }
}

/** Encoder helpers (Array[Float] has no Encoders.* shortcut). */
private[graft] object ExprEnc {
  import org.apache.spark.sql.Encoder
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val floatArray: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
}
