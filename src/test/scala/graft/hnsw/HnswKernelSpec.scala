package graft.hnsw

import org.scalatest.funsuite.AnyFunSuite

import graft.store.{ArrayVectorStore, CodeVectorStore, InMemoryGraph, Metrics}

import scala.util.Random

/** Executor-local kernel invariants — ports of the reference e2e tests
  * (hawk_searcher.rs:441-479 self-match; lazy_memory_store.rs:94-107
  * distance/match; graph degree bounds implied by connect_bidir). */
class HnswKernelSpec extends AnyFunSuite {

  private val params = HnswParams.standard(efConstruction = 32, efSearch = 24, m = 8)

  private def randomVectors(n: Int, dim: Int, seed: Int): Array[Array[Float]] = {
    val rng = new Random(seed)
    Array.fill(n)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  private def buildLocal(vecs: Array[Array[Float]]): (HnswSearcher, ArrayVectorStore, InMemoryGraph) = {
    val searcher = new HnswSearcher(params)
    val store = new ArrayVectorStore(Metrics.cosineDist, matchThreshold = 1e-9)
    val graph = new InMemoryGraph
    vecs.zipWithIndex.foreach { case (v, i) =>
      val q = store.prepareQueryWithId(i.toLong, v)
      searcher.insert(store, graph, q, searcher.selectLayerByHash(q, seed = 7L))
    }
    (searcher, store, graph)
  }

  test("params: standard config matches reference semantics (S1)") {
    val p = HnswParams.standard(64, 32, 32)
    assert(p.getM(0) == 32 && p.getM(4) == 32 && p.getM(17) == 32) // clamp
    assert(p.getMMax(0) == 64 && p.getMMax(1) == 32)               // M_max0 = 2M
    assert(p.getEfConstrSearch(2) == 1)                            // greedy descent
    assert(p.getEfConstrInsert(3) == 64)
    assert(p.getEfSearch(0) == 32 && p.getEfSearch(1) == 1)        // greedy above 0
    assert(p.layerProbability == 1.0 / 32)
  }

  test("params: m_L <-> layer probability roundtrip (S2)") {
    val p = 1.0 / 32
    val mL = HnswParams.mLFromLayerProbability(p)
    assert(math.abs(HnswParams.layerProbabilityFromML(mL) - p) < 1e-12)
    assert(math.abs(mL - 1.0 / math.log(32.0)) < 1e-12)
  }

  test("select_layer: hash-based geometric distribution with P(l>=1) ~ p (S3)") {
    val searcher = new HnswSearcher(params) // p = 1/8
    val n = 20000
    val layers = (0 until n).map(i => searcher.selectLayerByHash(i.toLong, seed = 3L))
    val p1 = layers.count(_ >= 1).toDouble / n
    assert(math.abs(p1 - 1.0 / 8) < 0.01, s"P(layer>=1)=$p1, want ~0.125")
    val p2 = layers.count(_ >= 2).toDouble / n
    assert(math.abs(p2 - 1.0 / 64) < 0.005, s"P(layer>=2)=$p2, want ~0.0156")
    // deterministic
    assert(layers == (0 until n).map(i => searcher.selectLayerByHash(i.toLong, 3L)))
  }

  test("self-match e2e invariant: every inserted vector matches itself (test_hnsw_db port)") {
    val vecs = randomVectors(200, 8, seed = 11)
    val searcher = new HnswSearcher(params)
    val store = new ArrayVectorStore(Metrics.cosineDist, matchThreshold = 1e-9)
    val graph = new InMemoryGraph

    // First half through the two-phase API with a pre-insert no-match
    // assert (hawk_searcher.rs:453-463), second half through insert().
    vecs.zipWithIndex.foreach { case (v, i) =>
      val q = store.prepareQueryWithId(i.toLong, v)
      val lay = searcher.selectLayerByHash(q, 7L)
      if (i < 100) {
        val (neighbors, setEp) = searcher.searchToInsert(store, graph, q, lay)
        assert(!searcher.isMatch(store, neighbors), s"unexpected pre-insert match for $i")
        store.insert(q)
        searcher.insertFromSearchResults(store, graph, q, neighbors, setEp)
      } else {
        searcher.insert(store, graph, q, lay)
      }
    }

    vecs.indices.foreach { i =>
      val w = searcher.search(store, graph, i.toLong, 1)
      assert(searcher.isMatch(store, Seq(w)), s"vector $i does not match itself")
      assert(w.getNearest.get.dst == i.toLong)
    }
  }

  test("degree bounds: every vertex respects M_max per layer (connect_bidir)") {
    val vecs = randomVectors(300, 8, seed = 13)
    val (_, _, graph) = buildLocal(vecs)
    (0 until graph.numLayers).foreach { lc =>
      val bound = params.getMMax(lc)
      graph.layerLinks(lc).foreach { case (src, q) =>
        assert(q.size <= bound, s"vertex $src layer $lc degree ${q.size} > $bound")
      }
    }
  }

  test("search recall vs brute force on a local graph") {
    val vecs = randomVectors(400, 8, seed = 17)
    val (searcher, store, graph) = buildLocal(vecs)
    val rng = new Random(19)
    val k = 10
    var hits = 0; var total = 0
    for (_ <- 1 to 30) {
      val qv = Array.fill(8)(rng.nextGaussian().toFloat)
      val q = store.prepareQueryWithId(-1L, qv)
      val got = searcher.search(store, graph, q, k).toArray.map(_.dst).toSet
      val exact = vecs.zipWithIndex
        .map { case (v, i) => (Metrics.cosineDist(qv, v), i.toLong) }
        .sorted.take(k).map(_._2).toSet
      hits += (got intersect exact).size; total += k
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.9, s"recall@$k = $recall < 0.9")
  }

  test("param sweep: recall holds across M/ef configurations and metrics") {
    val configs = Seq(
      (HnswParams.standard(32, 32, 8), "cosine"),
      (HnswParams.standard(64, 16, 16), "cosine"),
      (HnswParams.uniform(24, 8), "l2"),
      (HnswParams.standard(48, 48, 4), "l2"),
      (HnswParams.standard(32, 24, 12), "dot"))
    configs.zipWithIndex.foreach { case ((p, metricName), ci) =>
      val metric = graft.store.Metrics.byName(metricName)
      val vecs = randomVectors(250, 8, seed = 100 + ci)
      val searcher = new HnswSearcher(p)
      val store = new ArrayVectorStore(metric)
      val graph = new InMemoryGraph
      vecs.zipWithIndex.foreach { case (v, i) =>
        val q = store.prepareQueryWithId(i.toLong, v)
        searcher.insert(store, graph, q, searcher.selectLayerByHash(q, 1000 + ci))
      }
      val rng = new Random(200 + ci)
      var hits = 0; var total = 0
      for (_ <- 1 to 20) {
        val qv = Array.fill(8)(rng.nextGaussian().toFloat)
        val q = store.prepareQueryWithId(-1L, qv)
        val got = searcher.search(store, graph, q, 5).toArray.map(_.dst).toSet
        val exact = vecs.zipWithIndex
          .map { case (v, i) => (metric(qv, v), i.toLong) }
          .sorted.take(5).map(_._2).toSet
        hits += (got intersect exact).size; total += 5
      }
      val recall = hits.toDouble / total
      assert(recall >= 0.85, s"config $ci ($metricName): recall=$recall")
    }
  }

  test("empty index: search returns empty, isMatch false (S4/S11 edge)") {
    val searcher = new HnswSearcher(params)
    val store = new ArrayVectorStore(Metrics.cosineDist)
    val graph = new InMemoryGraph
    val q = store.prepareQueryWithId(0L, Array.fill(8)(1f))
    val w = searcher.search(store, graph, q, 5)
    assert(w.isEmpty)
    assert(!searcher.isMatch(store, Seq(w)))
    assert(!searcher.isMatch(store, Seq.empty))
  }

  test("entry point: monotone layer requirement enforced (graph_mem.rs:85-91)") {
    val g = new InMemoryGraph
    g.setEntryPoint(1L, 2)
    assertThrows[IllegalArgumentException](g.setEntryPoint(2L, 2))
    assertThrows[IllegalArgumentException](g.setEntryPoint(2L, 1))
    g.setEntryPoint(2L, 3)
    assert(g.getEntryPoint.contains(graft.store.EntryPoint(2L, 3)))
    assert(g.numLayers == 4)
  }

  test("graph remap (G6): identity preserves equality, non-trivial map differs (test_from_another_naive port)") {
    val vecs = randomVectors(60, 8, seed = 23)
    val (_, _, graph) = buildLocal(vecs)
    val same = graph.remap(identity)
    assert(graph.structurallyEquals(same))
    val doubled = graph.remap(_ * 2)
    assert(!graph.structurallyEquals(doubled))
    // structure preserved under remap (test_from_another port)
    (0 until graph.numLayers).foreach { lc =>
      graph.layerLinks(lc).foreach { case (src, q) =>
        val mapped = doubled.getLinks(src * 2, lc)
        assert(mapped.toArray.toList == q.toArray.map(n => Neighbor(n.dst * 2, n.dist)).toList)
      }
    }
  }

  test("type-generic remapTo (G6): refs translate between TYPES, order preserved (test_from_another port, graph_mem.rs:232-331)") {
    val vecs = randomVectors(60, 8, seed = 23)
    val (_, _, graph) = buildLocal(vecs)
    // the reference's maps: point_ids: PointId -> TestPointId (random
    // draw per vertex), distances: DistanceRef -> u32 (lookup). Ours
    // cross TYPE boundaries: Long -> String ids, Double -> (String,Long)
    // struct-ish distance handles.
    val rng = new Random(17)
    val pointIds: Map[Long, String] =
      (0L until 60L).map(i => i -> s"pt-${rng.nextInt(1000000)}-$i").toMap
    def distRef(d: Double): (String, Long) =
      ("d", java.lang.Double.doubleToRawLongBits(d))

    val typed = graph.remapTo(pointIds, distRef)

    // entry point translates, layer unchanged (graph_mem.rs:306-311)
    val ep = graph.getEntryPoint.get
    assert(typed.entryPoint.contains((pointIds(ep.point), ep.layer)))
    assert(typed.numLayers == graph.numLayers)

    // every queue: ids and distances translate PAIRWISE IN ORDER
    // (graph_mem.rs:313-330)
    (0 until graph.numLayers).foreach { lc =>
      val old = graph.layerLinks(lc)
      assert(typed.layers(lc).size == old.size)
      old.foreach { case (src, q) =>
        val newQ = typed.links(pointIds(src), lc)
        val oldQ = q.toArray
        assert(newQ.size == oldQ.length)
        oldQ.zip(newQ).foreach { case (n, (nid, nd)) =>
          assert(nid == pointIds(n.dst))
          assert(nd == distRef(n.dist))
        }
      }
    }

    // conversions compose and round-trip: map back through the inverse
    // refs and land in the runtime representation unchanged
    val inverse = pointIds.map(_.swap)
    val back = typed
      .map(inverse, { case (_, bits) => java.lang.Double.longBitsToDouble(bits) })
      .toInMemory
    assert(graph.structurallyEquals(back))
  }

  test("hamming code store: distance + self-match (lazy_memory_store.rs:94-107 port)") {
    val store = new CodeVectorStore()
    val a = store.prepareQuery(0xFFL)
    val b = store.prepareQuery(0x0FL)
    store.insert(a); store.insert(b)
    assert(store.evalDistance(a, a) == 0.0)
    assert(store.evalDistance(a, b) == 4.0)
    assert(store.isMatch(store.evalDistance(a, a)))
    assert(!store.isMatch(store.evalDistance(a, b)))
  }

  test("hnsw over hamming codes: self-match end-to-end") {
    val searcher = new HnswSearcher(params)
    val store = new CodeVectorStore()
    val graph = new InMemoryGraph
    val rng = new Random(29)
    val ids = (0 until 150).map { _ =>
      val q = store.prepareQuery(rng.nextLong())
      searcher.insert(store, graph, q, searcher.selectLayerByHash(q, 31L))
    }
    ids.foreach { id =>
      val w = searcher.search(store, graph, id, 1)
      assert(searcher.isMatch(store, Seq(w)), s"code $id missing self-match")
    }
  }

}
