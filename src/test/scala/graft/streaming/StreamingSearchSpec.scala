package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.hnsw.{HnswDurable, HnswParams}
import graft.operators.ExactKnn
import graft.streaming.StreamingIngest.IncrementalIndex

/** Streaming ANN serving: query micro-batches interleaved with ingest
  * micro-batches against one live index, empty-index start, and the
  * durable (beyond-driver-memory) serving tier with tombstones. */
class StreamingSearchSpec extends SparkSpec {

  // exact-regime config: generous beam so served top-k == brute force
  private val cfg = BuildConfig(
    HnswParams.standard(efConstruction = 64, efSearch = 128, m = 16),
    metric = "cosine", seed = 7L)

  private def vecsOf(n: Int, offset: Long = 0L): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(offset + 31)
    (0 until n).map(i => ((offset + i, Array.fill(8)(rng.nextGaussian().toFloat))))
  }

  private def served(res: org.apache.spark.sql.DataFrame): Map[(Long, Int), Long] =
    res.collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap

  test("interleaved ingest and search streams: results track the live index state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = new IncrementalIndex(cfg)

    val ingestMem = MemoryStream[(Long, Array[Float])]
    val queryMem = MemoryStream[(Long, Array[Float])]
    val results = scala.collection.mutable.Map.empty[Long, Map[(Long, Int), Long]]
    val ingestQ = StreamingIngest.attach(ingestMem.toDF().toDF("id", "vec"), index)
    val searchQ = StreamingSearch.attach(
      queryMem.toDF().toDF("id", "vec"), index, k = 5) { (res, bid) =>
      results(bid) = served(res)
    }

    try {
      // search BEFORE any ingest: typed empty result, no crash
      val queries = vecsOf(10, offset = 10000L)
      queryMem.addData(queries: _*)
      searchQ.processAllAvailable()
      assert(results.values.flatten.isEmpty, "empty index must serve zero rows")

      // ingest batch A, then search: exact-regime top-5 == brute force over A
      val a = vecsOf(60)
      ingestMem.addData(a: _*)
      ingestQ.processAllAvailable()
      queryMem.addData(queries: _*)
      searchQ.processAllAvailable()
      val afterA = results.maxBy(_._1)._2
      val exactA = served(ExactKnn.search(
        queries.toDF("qid", "qvec"), a.toDF("id", "vec"), 5, "cosine"))
      assert(afterA == exactA, "served top-k after batch A must equal brute force over A")

      // ingest batch B, search again: the SAME queries now see A union B
      val b = vecsOf(60, offset = 60)
      ingestMem.addData(b: _*)
      ingestQ.processAllAvailable()
      queryMem.addData(queries: _*)
      searchQ.processAllAvailable()
      val afterAB = results.maxBy(_._1)._2
      val exactAB = served(ExactKnn.search(
        queries.toDF("qid", "qvec"), (a ++ b).toDF("id", "vec"), 5, "cosine"))
      assert(afterAB == exactAB, "served top-k after batch B must equal brute force over A∪B")
      assert(afterA != afterAB, "batch B must actually change some result")
    } finally { ingestQ.stop(); searchQ.stop() }
  }

  test("model snapshots are memoized between inserts (per-batch serving cost is O(1) when idle)") {
    val index = new IncrementalIndex(cfg)
    index.insertRows(vecsOf(20).toArray)
    val m1 = index.model
    assert(index.model eq m1, "no mutation => the same snapshot instance")
    index.insertRows(vecsOf(5, offset = 100L).toArray)
    assert(!(index.model eq m1), "an insert must invalidate the snapshot")
    index.insertRows(vecsOf(5, offset = 100L).toArray) // full redelivery: no-op
    val m2 = index.model
    assert(index.model eq m2, "an idempotent-skipped batch must not invalidate")
  }

  test("durable serving stream: answers from the parquet store, tombstones excluded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_streamserve_").toString
    val base = vecsOf(80)
    val vecsDf = base.toDF("id", "vec")
    vecsDf.write.mode("overwrite").parquet(s"$dir/vectors")
    def vectorsOf() = spark.read.parquet(s"$dir/vectors")
    val store = HnswDurable.build(vectorsOf(), dir, cfg)
    // tombstone a handful of ids: served results must never contain them
    val dead = Set(3L, 7L, 11L)
    store.addTombstones(dead.toSeq.toDF("id"))

    val queryMem = MemoryStream[(Long, Array[Float])]
    val results = scala.collection.mutable.Map.empty[Long, Map[(Long, Int), Long]]
    val q = StreamingSearch.attachDurable(
      queryMem.toDF().toDF("id", "vec"), store, () => vectorsOf(),
      k = 5, ef = 128) { (res, bid) => results(bid) = served(res) }
    try {
      val queries = vecsOf(8, offset = 20000L)
      queryMem.addData(queries: _*)
      q.processAllAvailable()
      val got = results.maxBy(_._1)._2
      val exact = served(ExactKnn.search(
        queries.toDF("qid", "qvec"),
        base.filterNot(v => dead(v._1)).toDF("id", "vec"), 5, "cosine"))
      assert(got == exact,
        "durable served top-k must equal brute force over the non-tombstoned corpus")
    } finally q.stop()
  }

  test("routed serving stream interleaves with CDC: queries see the state at batch time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.hnsw.HnswRouted
    val base = vecsOf(600)
    val handle = new StreamingRouted.Handle(
      HnswRouted.build(base.toDF("id", "vec"), cfg, nCells = 4))
    val cdcMem = MemoryStream[(Long, Array[Float], String)]
    val queryMem = MemoryStream[(Long, Array[Float])]
    val results = scala.collection.mutable.Map.empty[Long, Map[(Long, Int), Long]]
    val cdcQ = StreamingRouted.attachCdc(
      cdcMem.toDF().toDF("id", "vec", "op"), handle, compactThreshold = 1.0)
    val serveQ = StreamingSearch.attachRouted(
      queryMem.toDF().toDF("id", "vec"), handle, k = 5, nProbe = 4) {
      (res, bid) => results(bid) = served(res) }
    try {
      val queries = vecsOf(8, offset = 40000L)
      // serve against the seed state
      queryMem.addData(queries: _*); serveQ.processAllAvailable()
      val before = results.maxBy(_._1)._2
      assert(before == served(ExactKnn.search(
        queries.toDF("qid", "qvec"), base.toDF("id", "vec"), 5, "cosine")))
      // CDC: delete a slice, insert a tail — the NEXT query batch must
      // reflect both (exclusion via tombstones, inclusion via ingest)
      val tail = vecsOf(100, offset = 1000L)
      cdcMem.addData(
        tail.map { case (id, v) => (id, v, "insert") } ++
          (0 until 50).map(i => (i.toLong, base.head._2, "delete")): _*)
      cdcQ.processAllAvailable()
      queryMem.addData(queries: _*); serveQ.processAllAvailable()
      val after = results.maxBy(_._1)._2
      val corpus = base.filter(_._1 >= 50) ++ tail
      assert(after == served(ExactKnn.search(
        queries.toDF("qid", "qvec"), corpus.toDF("id", "vec"), 5, "cosine")),
        "post-CDC serving must equal brute force over the evolved corpus")
    } finally { cdcQ.stop(); serveQ.stop(); handle.index.unpersist() }
  }
}
