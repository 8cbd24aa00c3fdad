package graft.hnsw

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.Ivf
import graft.store.{ArrayVectorStore, GraphSnapshot, InMemoryGraph, Metrics}

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
  * ivf_cell — no UDF), ONE shuffle on the cell id, then per-cell
  * sequential HNSW construction inside mapPartitions — no driver
  * round-trips, no cross-cell traffic.
  */
object HnswRouted {

  /** One cell's shard: its id, vectors, and private graph. */
  final case class CellShard(
      cell: Int,
      vectors: collection.Map[Long, Array[Float]],
      snapshot: GraphSnapshot
  ) extends Serializable

  final case class RoutedIndex(
      cfg: BuildConfig,
      ivf: Ivf.IvfModel,
      shards: org.apache.spark.rdd.RDD[CellShard]) {
    def unpersist(): Unit = shards.unpersist()
  }

  private val tripleEnc = Encoders.tuple(
    Encoders.scalaLong, ExprEnc.floatArray, Encoders.scalaInt)

  def build(vectors: DataFrame, cfg: BuildConfig = BuildConfig(),
            nCells: Int = 16, persist: Boolean = true): RoutedIndex = {
    // GLOBAL id dedup before cell assignment (the HnswDistributed.build
    // duplicate-id guard, but cross-cell: duplicate rows with different
    // vectors would route to DIFFERENT cells and surface the same id
    // twice in one top-k). max(vec) — arrays order lexicographically —
    // makes the surviving row deterministic, not partition-dependent.
    val deduped = vectors.select(col("id"), col("vec"))
      .groupBy(col("id")).agg(max(col("vec")).as("vec"))
    val ivf = Ivf.train(deduped, nCells, cfg.metric, seed = cfg.seed)
    val shards = deduped
      .select(col("id"), col("vec"), Ivf.cellCol(ivf)(col("vec")).as("cell"))
      .repartition(nCells, col("cell"))
      .as(tripleEnc)
      .mapPartitions { it =>
        // hash(cell) % nCells can co-locate cells: build one shard per
        // CELL within the partition, not one per partition
        it.toArray.groupBy(_._3).iterator.map { case (cell, rows) =>
          val shard = rows.map(r => (r._1, r._2)).sortBy(_._1)
          val metric = Metrics.byName(cfg.metric)
          val searcher = new HnswSearcher(cfg.params)
          val vecMap = scala.collection.mutable.LongMap.from(shard.iterator)
          val store = new ArrayVectorStore(metric, base = vecMap)
          shard.foreach { case (id, v) => store.prepareQueryWithId(id, v) }
          val graph = new InMemoryGraph
          shard.foreach { case (id, _) =>
            searcher.insert(store, graph, id,
              searcher.selectLayerByHash(id, cfg.seed))
          }
          CellShard(cell, vecMap, graph.snapshot)
        }
      }(Encoders.kryo[CellShard])
      .rdd
    if (persist) {
      shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .setName("graft-hnsw-routed")
      shards.count() // materialize the build eagerly
    }
    RoutedIndex(cfg, ivf, shards)
  }

  /** The driver-side router: a query batch is tiny next to the corpus,
    * and centroids are tiny next to everything — assign each query its
    * nProbe nearest cells here, then invert to cell -> queries so each
    * shard pulls exactly its own probe set from one broadcast. */
  private def probesByCell(qs: Array[(Long, Array[Float])],
                           ivf: Ivf.IvfModel, nProbe: Int)
      : Map[Int, Array[(Long, Array[Float])]] = {
    val dist = Metrics.byName(ivf.metricName)
    val cs = ivf.centroids
    val p = math.min(nProbe, cs.length)
    qs.flatMap { case (qid, qv) =>
      val byDist = Array.tabulate(cs.length)(c => (c, dist(qv, cs(c))))
      java.util.Arrays.sort(byDist,
        Ordering.by[(Int, Double), (Double, Int)](x => (x._2, x._1)))
      byDist.iterator.take(p).map { case (c, _) => (c, (qid, qv)) }
    }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
  }

  /** Search the routed index: only the nProbe cells a query routed to
    * ever see it; per-cell HNSW answers top-k; tiny global merge
    * (<= k rows per query per probed cell). Returns (qid, id, dist, rank).
    *
    * `ef0` (0 = configured default) widens ONLY the in-cell layer-0
    * beam — the recall knob the 1e7 rehearsal identified: dense cells
    * (156k near-duplicate points at 1e7/64 cells) miss at the default
    * ef_search=32 regardless of how many cells are probed, because
    * probe4 and probe64 run the same in-cell search. Widening ef costs
    * per-probed-cell work; adding cells costs fan-out — independent
    * dials for the two loss modes. */
  def search(index: RoutedIndex, queries: DataFrame, k: Int,
             nProbe: Int, ef0: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val cfg = index.cfg
    val pairEnc = Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)
    val qArr = queries.select(col("qid"), col("qvec")).as(pairEnc).collect()
    val qB = spark.sparkContext.broadcast(
      probesByCell(qArr, index.ivf, nProbe))
    import spark.implicits._
    val perShard = index.shards.flatMap { m =>
      val probes = qB.value.getOrElse(m.cell, Array.empty[(Long, Array[Float])])
      if (probes.isEmpty) Iterator.empty
      else {
        val metric = Metrics.byName(cfg.metric)
        val searcher = new HnswSearcher(cfg.params)
        // one store per shard, -1 query slot re-staged per query (the
        // searchSharded pattern)
        val qStore = new ArrayVectorStore(metric, base = m.vectors)
        probes.iterator.flatMap { case (qid, qvec) =>
          val q = qStore.prepareQueryWithId(-1L, qvec)
          searcher.searchWithEf(qStore, m.snapshot, q, k,
            math.max(ef0, cfg.params.getEfSearch(0)))
            .iterator.map(nb => (qid, nb.dst, nb.dist))
        }
      }
    }.toDF("qid", "id", "dist")

    import org.apache.spark.sql.expressions.Window
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))))
      .filter(col("rank") <= k)
  }

  /** Process-wide memo (the shardCache pattern), keyed by app id so a
    * handle of a stopped SparkContext is never served. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, RoutedIndex]()

  def buildCached(vectors: DataFrame, cfg: BuildConfig, nCells: Int,
                  key: String): RoutedIndex =
    cache.computeIfAbsent(
      s"${vectors.sparkSession.sparkContext.applicationId}|$key|$nCells|" +
        HnswDistributed.cacheKey(cfg),
      _ => graft.BuildLedger.timed("hnsw_routed_build")(
        build(vectors, cfg, nCells)))
}
