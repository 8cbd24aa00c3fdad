package graft.hnsw

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.operators.ExactKnn
import graft.store.{ArrayVectorStore, Metrics}

/** Forced serialization round-trips of every cached/broadcast shard
  * payload. The hazard class is real, not theoretical: scala's
  * `mutable.LongMap` held in RDD-cached shard state deserialized CORRUPT
  * under Spark's KryoSerializer and SIGSEGV'd the JVM at the round-16
  * 1e7 PQ rung (hs_err frame inside `LongMap.foreachKey` after a
  * DISK_ONLY eviction). The float tier survived only because its shards
  * stayed memory-resident at rehearsed scales — the assumption a 100x
  * scale-up breaks. These tests force the round-trip the eviction path
  * takes: an explicit Kryo serialize -> deserialize on every payload
  * class, plus a DISK_ONLY serve (every read deserializes from disk). */
class KryoRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def vecFromHash(i: Long, seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      (HnswSearcher.uniformFromHash(i * dim + d, seed) * 2.0 - 1.0).toFloat)

  private val cfg = BuildConfig(
    HnswParams.standard(64, 128, 16), metric = "cosine", seed = 42L)

  private def kryoRoundTrip[T: scala.reflect.ClassTag](v: T): T = {
    val ser = new org.apache.spark.serializer.KryoSerializer(
      spark.sparkContext.getConf)
    val inst = ser.newInstance()
    inst.deserialize[T](inst.serialize(v))
  }

  test("LongVecMap survives a forced Kryo round-trip (keys, values, growth)") {
    val m = new LongVecMap(4)
    val rows = (0 until 5000).map(i => (i.toLong * 37 - 2500, vecFromHash(i.toLong, 5L, 8)))
    rows.foreach { case (k, v) => m.put(k, v) }
    m.put(Long.MinValue, vecFromHash(-1L, 5L, 8)) // the empty-slot sentinel key
    val rt = kryoRoundTrip(m)
    assert(rt.size == m.size)
    assert(rt.keySet == m.keySet)
    rows.foreach { case (k, v) =>
      assert(rt.contains(k) && rt(k).toSeq == v.toSeq, s"value mismatch at $k")
    }
    assert(rt(Long.MinValue).toSeq == m(Long.MinValue).toSeq)
    // the table must stay structurally sound post-deserialize: puts
    // (including growth) and full walks still work
    (5000 until 12000).foreach(i => rt.put(i.toLong * 37, vecFromHash(i.toLong, 6L, 8)))
    var walked = 0
    rt.foreachKey(_ => walked += 1)
    assert(walked == rt.size && rt.size == m.size + 7000)
  }

  test("routed float CellShard Kryo round-trips and serves identically") {
    val n = 1500
    val baseDf = (0 until n).map(i => (i.toLong, vecFromHash(i.toLong, 7L, 16)))
      .toDF("id", "vec")
    val qDf = (0 until 40).map(q => (q.toLong, vecFromHash(q + 90000L, 9L, 16)))
      .toDF("qid", "qvec")
    val index = HnswRouted.build(baseDf, cfg, nCells = 6, persist = false)
    val part = index.shards.partitioner.get
    val rtShards = spark.sparkContext
      .parallelize(index.shards.collect().map(kryoRoundTrip(_)).toSeq)
      .partitionBy(part)
    val rtIndex = index.copy(shards = rtShards)
    def serve(ix: HnswRouted.RoutedIndex) =
      HnswRouted.search(ix, qDf, 10, nProbe = 6)
        .select(col("qid"), col("id"), col("dist")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(serve(rtIndex) == serve(index))
  }

  test("routed float tier serves correctly from DISK_ONLY (every read deserializes)") {
    // the exact trigger of the round-16 SIGSEGV, on the float tier: the
    // shard RDD's only copy lives serialized on disk, so EVERY serve
    // job Kryo-deserializes the shards before searching
    val n = 1500
    val baseDf = (0 until n).map(i => (i.toLong, vecFromHash(i.toLong, 7L, 16)))
      .toDF("id", "vec")
    val qDf = (0 until 40).map(q => (q.toLong, vecFromHash(q + 90000L, 9L, 16)))
      .toDF("qid", "qvec")
    val index = HnswRouted.build(baseDf, cfg, nCells = 6, persist = false)
    index.shards.persist(StorageLevel.DISK_ONLY).setName("kryo-spec-disk").count()
    try {
      val routed = HnswRouted.search(index, qDf, 10, nProbe = 6)
        .select(col("qid"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = ExactKnn.search(qDf, baseDf, 10, "cosine")
        .select(col("qid"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(routed == exact)
    } finally index.shards.unpersist(blocking = true)
  }

  test("codes-tier CodeCellShard and PQ-tier PqCellShard Kryo round-trip and serve identically") {
    // the codes/PQ shard payloads are LongLongMap-backed (the class the
    // 1e8 decade proved through DISK_ONLY) — this pins the WHOLE shard
    // case classes, snapshot included, through the explicit round-trip
    @inline def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val codesDf = (0L until 1200L).map(i => (i, mix(i))).toDF("id", "code")
    val cIx = HnswRoutedCodes.build(codesDf, cfg.params, nCells = 4,
      persist = false)
    val cPart = cIx.shards.partitioner.get
    val cRt = cIx.copy(shards = spark.sparkContext
      .parallelize(cIx.shards.collect().map(kryoRoundTrip(_)).toSeq)
      .partitionBy(cPart))
    val qC = (0 until 30).map(q => (q.toLong, mix(q + 50000L))).toDF("qid", "qcode")
    def serveC(ix: HnswRoutedCodes.RoutedCodeIndex) =
      HnswRoutedCodes.search(ix, qC, 10, nProbe = 4)
        .select(col("qid"), col("id"), col("hamming")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(serveC(cRt) == serveC(cIx))

    val vecsDf = (0 until 1200).map(i => (i.toLong, vecFromHash(i.toLong, 7L, 16)))
      .toDF("id", "vec")
    val rIx = HnswRouted.build(vecsDf,
      cfg.copy(metric = "l2"), nCells = 4, persist = false)
    val pIx = HnswRoutedPq.fromRouted(rIx, persist = false)
    val pPart = pIx.shards.partitioner.get
    val pRt = pIx.copy(shards = spark.sparkContext
      .parallelize(pIx.shards.collect().map(kryoRoundTrip(_)).toSeq)
      .partitionBy(pPart))
    val qP = (0 until 30).map(q => (q.toLong, vecFromHash(q + 50000L, 9L, 16)))
      .toDF("qid", "qvec")
    def serveP(ix: HnswRoutedPq.RoutedPqIndex) =
      HnswRoutedPq.search(ix, qP, vecsDf, k = 10, nProbe = 4, candidates = 64)
        .select(col("qid"), col("id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(serveP(pRt) == serveP(pIx))
  }

  test("sharded-tier ShardModel and broadcast-tier HnswModel Kryo round-trip") {
    val rows = (0 until 800).map(i => (i.toLong, vecFromHash(i.toLong, 11L, 16)))
    val model = HnswDistributed.buildFromArray(spark, rows.toArray, cfg)
    val rt = kryoRoundTrip(model)
    assert(rt.vectors.size == model.vectors.size)
    rows.foreach { case (id, v) =>
      assert(rt.vectors(id).toSeq == v.toSeq, s"model vector mismatch at $id")
    }
    // serve through the round-tripped model: same kNN as the original
    val metric = Metrics.byName(cfg.metric)
    def knn(m: HnswModel, qvec: Array[Float]): Seq[(Long, Double)] = {
      val searcher = new HnswSearcher(m.params)
      val store = new ArrayVectorStore(metric, base = m.vectors)
      val q = store.prepareQueryWithId(-1L, qvec)
      searcher.search(store, m.snapshot, q, 10).iterator
        .map(nb => (nb.dst, nb.dist)).toSeq
    }
    (0 until 10).foreach { qi =>
      val qvec = vecFromHash(qi + 70000L, 13L, 16)
      assert(knn(rt, qvec) == knn(model, qvec), s"serve diverged for query $qi")
    }
    val sm = HnswDistributed.ShardModel(rt.vectors, rt.snapshot)
    val smRt = kryoRoundTrip(sm)
    assert(smRt.vectors.size == sm.vectors.size &&
      smRt.vectors.keySet == sm.vectors.keySet)
  }
}
