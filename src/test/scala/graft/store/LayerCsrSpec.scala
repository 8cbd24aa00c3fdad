package graft.store

import org.scalatest.funsuite.AnyFunSuite

import graft.hnsw.{FurthestQueue, Neighbor}

/** The CSR layer representation under GraphSnapshot: map round-trips,
  * binary-search lookups, empty/edge shapes, and equivalence between the
  * boxed-map import path and InMemoryGraph's direct CSR export. */
class LayerCsrSpec extends AnyFunSuite {

  private val m: Map[Long, (Array[Long], Array[Double])] = Map(
    5L -> (Array(1L, 9L), Array(0.1, 0.7)),
    2L -> (Array(7L), Array(0.3)),
    11L -> (Array.emptyLongArray, Array.emptyDoubleArray)
  )

  test("fromMap/toMap round-trip preserves every adjacency") {
    val csr = LayerCsr.fromMap(m)
    assert(csr.size == 3)
    assert(csr.srcs.toList == List(2L, 5L, 11L)) // sorted
    val back = csr.toMap
    assert(back.keySet == m.keySet)
    m.foreach { case (src, (dsts, dists)) =>
      assert(back(src)._1.toList == dsts.toList)
      assert(back(src)._2.toList == dists.toList)
    }
  }

  test("contains/indexOf binary search: hits, misses, boundaries") {
    val csr = LayerCsr.fromMap(m)
    assert(csr.contains(2L) && csr.contains(5L) && csr.contains(11L))
    assert(!csr.contains(1L) && !csr.contains(3L) && !csr.contains(12L)
      && !csr.contains(Long.MinValue) && !csr.contains(Long.MaxValue))
  }

  test("empty layer is usable") {
    assert(LayerCsr.empty.size == 0)
    assert(LayerCsr.empty.edgeCount == 0)
    assert(!LayerCsr.empty.contains(0L))
    assert(LayerCsr.empty.entriesIterator.isEmpty)
  }

  test("GraphSnapshot.getLinks/foreachLink over CSR match the source queues") {
    val g = new InMemoryGraph
    g.setEntryPoint(5L, 1)
    g.setLinks(5L, FurthestQueue.fromAscending(
      Seq(Neighbor(1L, 0.1), Neighbor(9L, 0.7))), 0)
    g.setLinks(2L, FurthestQueue.fromAscending(Seq(Neighbor(7L, 0.3))), 0)
    g.setLinks(5L, FurthestQueue.fromAscending(Seq(Neighbor(2L, 0.2))), 1)
    val s = g.snapshot
    assert(s.numLayers == 2)
    assert(s.getLinks(5L, 0).iterator.map(n => (n.dst, n.dist)).toList ==
      List((1L, 0.1), (9L, 0.7)))
    assert(s.getLinks(2L, 0).iterator.map(_.dst).toList == List(7L))
    assert(s.getLinks(99L, 0).isEmpty)    // absent vertex
    assert(s.getLinks(5L, 7).isEmpty)     // absent layer
    var seen = List.empty[Long]
    s.foreachLink(5L, 0)(id => seen ::= id)
    assert(seen.reverse == List(1L, 9L))
    assert(s.vertexCount(0) == 2 && s.vertexCount(1) == 1)
    assert(s.edgeCount == 4L) // 2 + 1 on layer 0, 1 on layer 1
  }

  test("fromMaps import equals InMemoryGraph CSR export") {
    val g = new InMemoryGraph
    g.setEntryPoint(5L, 0)
    m.foreach { case (src, (dsts, dists)) =>
      g.setLinks(src, FurthestQueue.fromAscending(
        dsts.indices.map(i => Neighbor(dsts(i), dists(i)))), 0)
    }
    val direct = g.snapshot
    val imported = GraphSnapshot.fromMaps(direct.entryPoint, Seq(m))
    assert(imported.layers.length == direct.layers.length)
    imported.layers.zip(direct.layers).foreach { case (a, b) =>
      assert(a.srcs.toList == b.srcs.toList)
      assert(a.offsets.toList == b.offsets.toList)
      assert(a.dsts.toList == b.dsts.toList)
      assert(a.dists.toList == b.dists.toList)
    }
  }
}
