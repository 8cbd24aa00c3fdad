package graft.hnsw

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.hnsw.HnswDistributed.BuildConfig
import graft.store.{ArrayVectorStore, InMemoryGraph, Metrics}

/** The relational connect_bidir merge must agree with the reference
  * in-memory mutation for the same insert. */
class GraphFramesSpec extends SparkSpec {

  private val params = HnswParams.standard(16, 16, 4)

  private def smallModel(): (HnswModel, Array[(Long, Array[Float])]) = {
    val rng = new scala.util.Random(3)
    val rows = Array.tabulate(80)(i => (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat)))
    val model = HnswDistributed.buildFromArray(spark, rows,
      BuildConfig(params, "cosine", seed = 2L))
    (model, rows)
  }

  private def linksAsMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), List[(Long, Double)]] =
    df.collect().map { r =>
      (r.getLong(0), r.getInt(1)) ->
        r.getSeq[Row](2).map(n => (n.getLong(0), n.getDouble(1))).toList
    }.toMap

  test("connectBidirMerge == local connect_bidir for a new vector insert") {
    val (model, rows) = smallModel()
    val rng = new scala.util.Random(17)
    val newId = 1000L
    val newVec = Array.fill(8)(rng.nextGaussian().toFloat)

    // phase 1 against the current graph
    val searcher = new HnswSearcher(params)
    val store = new ArrayVectorStore(Metrics.cosineDist, base = model.vectors)
    store.prepareQueryWithId(newId, newVec)
    val insLayer = 0
    val (queues, setEp) = searcher.searchToInsert(store, model.snapshot, newId, insLayer)

    // local apply (the reference path)
    val localGraph = InMemoryGraph.fromSnapshot(model.snapshot)
    searcher.insertFromSearchResults(store, localGraph, newId,
      queues.map(_.copy()), setEp)
    val localLinks = linksAsMap(GraphFrames.toLinksDF(spark, localGraph.snapshot))

    // DataFrame apply: newLinks rows trimmed to M per layer
    import spark.implicits._
    val newLinksRows = queues.zipWithIndex.map { case (q, lc) =>
      val t = q.copy(); t.trimToKNearest(params.getM(lc))
      (newId, lc, t.toArray.map(n => (n.dst, n.dist)).toSeq)
    }
    val newLinksDF = newLinksRows.toDF("q", "layer", "raw")
      .select(col("q"), col("layer"),
        expr("transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))
    val mergedLinks = linksAsMap(
      GraphFrames.connectBidirMerge(
        GraphFrames.toLinksDF(spark, model.snapshot), newLinksDF, params))

    assert(mergedLinks == localLinks)
  }

  test("connectBidirMerge stores an empty neighborhood for a first insert (fresh graph)") {
    import spark.implicits._
    val emptyLinks = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], GraphFrames.linksSchema)
    val newLinks = Seq((7L, 0, Seq.empty[(Long, Double)]))
      .toDF("q", "layer", "raw")
      .select(col("q"), col("layer"),
        expr("transform(raw, x -> struct(x._1 AS dst, x._2 AS dist))").as("links"))
    val merged = linksAsMap(GraphFrames.connectBidirMerge(emptyLinks, newLinks, params))
    assert(merged == Map((7L, 0) -> List.empty[(Long, Double)]))
  }

  test("toLinksDF/fromLinksDF round-trips an arbitrary snapshot") {
    val (model, _) = smallModel()
    val back = GraphFrames.fromLinksDF(
      GraphFrames.toLinksDF(spark, model.snapshot), model.snapshot.entryPoint)
    assert(back.numLayers == model.snapshot.numLayers)
    (0 until back.numLayers).foreach { lc =>
      assert(back.layerMap(lc).keySet == model.snapshot.layerMap(lc).keySet)
      back.layerMap(lc).foreach { case (src, (dsts, dists)) =>
        val (od, odist) = model.snapshot.layerMap(lc)(src)
        assert(dsts.toList == od.toList && dists.toList == odist.toList)
      }
    }
  }
}
