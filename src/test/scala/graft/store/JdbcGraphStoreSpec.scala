package graft.store

import org.scalatest.funsuite.AnyFunSuite

import graft.hnsw.{FurthestQueue, HnswParams, HnswSearcher, Neighbor}

/** Port of the reference's Postgres-store tests onto [[JdbcGraphStore]]
  * (embedded Derby): the CRUD round-trip of graph_pg.rs:231-286
  * (entry-point upsert + per-vertex links upsert/read-back) and the
  * end-to-end HNSW build/self-match of graph_pg.rs:288-325, plus the
  * derived numLayers the reference left `todo!()` and durability across
  * a close/reopen (the property a remote store exists to provide). */
class JdbcGraphStoreSpec extends AnyFunSuite {

  // keep derby.log out of the repo root
  System.setProperty("derby.stream.error.file",
    s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")

  private def freshStore(): (JdbcGraphStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc_").toString
    (JdbcGraphStore.derby(s"$dir/db"), s"$dir/db")
  }

  private def vec(i: Int): Array[Float] = Array(i.toFloat, (i * i).toFloat, 1.0f)

  test("entry point + links CRUD round-trip (graph_pg.rs:231-286)") {
    val (graph, dir) = freshStore()
    val store = new ArrayVectorStore(Metrics.cosineDist)
    val vectors = (0 until 10).map { i =>
      val q = store.prepareQueryWithId(i.toLong, vec(i)); store.insert(q)
    }
    val distances = vectors.map(v => store.evalDistance(vectors.head, v))

    assert(graph.getEntryPoint.isEmpty)
    val ep2 = EntryPoint(vectors.head, graph.getEntryPoint.map(_.layer).getOrElse(0) + 1)
    graph.setEntryPoint(ep2.point, ep2.layer)
    assert(graph.getEntryPoint.contains(ep2))

    (1 until 4).foreach { i =>
      val links = FurthestQueue.empty
      (4 until 7).foreach(j => links.insert(vectors(j), distances(j)))
      graph.setLinks(vectors(i), links, 0)
      val links2 = graph.getLinks(vectors(i), 0)
      assert(links2.toArray.toSeq === links.toArray.toSeq)
    }

    // absent vertex -> empty queue (graph_pg.rs:106 unwrap_or_else(new))
    assert(graph.getLinks(999L, 0).isEmpty)

    // durability: a REOPENED store sees everything (the reason this
    // impl exists over the in-memory graph)
    graph.close()
    val reopened = new JdbcGraphStore(s"jdbc:derby:$dir")
    assert(reopened.getEntryPoint.contains(ep2))
    assert(reopened.getLinks(vectors(1), 0).toArray.toSeq.nonEmpty)
    reopened.close()
  }

  test("links upsert overwrites in place (ON CONFLICT DO UPDATE semantics)") {
    val (graph, _) = freshStore()
    graph.setLinks(5L, FurthestQueue.fromAscending(Seq(Neighbor(1L, 0.25))), 2)
    graph.setLinks(5L, FurthestQueue.fromAscending(
      Seq(Neighbor(2L, 0.125), Neighbor(3L, 0.5))), 2)
    assert(graph.getLinks(5L, 2).toArray.toSeq ===
      Seq(Neighbor(2L, 0.125), Neighbor(3L, 0.5)))
    graph.close()
  }

  test("numLayers derives from links + entry (the reference's todo!())") {
    val (graph, _) = freshStore()
    assert(graph.numLayers === 0)
    graph.setEntryPoint(1L, 2)
    assert(graph.numLayers === 3)
    graph.setLinks(1L, FurthestQueue.fromAscending(Seq(Neighbor(2L, 1.0))), 4)
    assert(graph.numLayers === 5)
    graph.close()
  }

  test("HNSW build + self-match end-to-end over JDBC (graph_pg.rs:288-325)") {
    val (graph, _) = freshStore()
    val store = new ArrayVectorStore(Metrics.cosineDist, matchThreshold = 1e-9)
    val searcher = new HnswSearcher(HnswParams.standard(64, 32, 16))

    val queries = (0 until 10).map(i => store.prepareQueryWithId(i.toLong, vec(i)))
    queries.foreach { q =>
      val insertionLayer = searcher.selectLayerByHash(q, seed = 0L)
      val (neighbors, setEp) = searcher.searchToInsert(store, graph, q, insertionLayer)
      assert(!searcher.isMatch(store, neighbors), s"premature match for $q")
      val inserted = store.insert(q)
      searcher.insertFromSearchResults(store, graph, inserted, neighbors, setEp)
    }
    queries.foreach { q =>
      val neighbors = searcher.search(store, graph, q, 1)
      assert(searcher.isMatch(store, Seq(neighbors)), s"no self-match for $q")
    }
    graph.close()
  }
}
