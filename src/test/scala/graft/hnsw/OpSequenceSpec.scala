package graft.hnsw

import org.scalatest.funsuite.AnyFunSuite

import graft.store.{EntryPoint, GraphStore, InMemoryGraph, VectorStore}

/** Port of the reference's op-sequence tests (coroutine.rs:218-304): the
  * strongest behavioral pin in the reference suite drives a search and
  * asserts the EXACT order and payloads of every operation crossing the
  * store boundary (GetEntryPoint → EvalDistance[Batch] → LessThan →
  * GetLinks → …). Here the same contract is pinned with recording
  * proxies around the kernel's [[VectorStore]]/[[GraphStore]] traits —
  * any refactor that changes which ops the kernel issues, their order,
  * or their payloads fails these specs.
  *
  * The vector store is the integer-distance TestStore shape the
  * reference uses (graph_mem.rs:197-230): values are longs, distance is
  * |q - v|, so every asserted payload is exact.
  */
class OpSequenceSpec extends AnyFunSuite {

  /** id -> integer value; distance |value(q) - value(v)|. */
  private final class LongValueStore(vals: Map[Long, Long]) extends VectorStore {
    type Raw = Long
    override def prepareQuery(raw: Long): Long =
      throw new UnsupportedOperationException("ids are pre-staged")
    override def insert(q: Long): Long = q
    override def evalDistance(q: Long, v: Long): Double =
      math.abs(vals(q) - vals(v)).toDouble
    override def isMatch(d: Double): Boolean = d <= 0.0
  }

  private final class RecordingVectorStore(
      inner: VectorStore { type Raw = Long },
      log: collection.mutable.Buffer[String]) extends VectorStore {
    type Raw = Long
    override def prepareQuery(raw: Long): Long = {
      log += s"PrepareQuery($raw)"; inner.prepareQuery(raw)
    }
    override def insert(q: Long): Long = { log += s"Insert($q)"; inner.insert(q) }
    override def insertBatch(qs: Array[Long]): Array[Long] = {
      log += s"InsertBatch(${qs.mkString(",")})"; inner.insertBatch(qs)
    }
    override def evalDistance(q: Long, v: Long): Double = {
      log += s"EvalDistance($q,$v)"; inner.evalDistance(q, v)
    }
    override def evalDistanceBatch(q: Long, vs: Array[Long]): Array[Double] = {
      log += s"EvalDistanceBatch($q,[${vs.mkString(",")}])"
      inner.evalDistanceBatch(q, vs)
    }
    override def isMatch(d: Double): Boolean = { log += s"IsMatch($d)"; inner.isMatch(d) }
    override def lessThan(d1: Double, d2: Double): Boolean = {
      log += s"LessThan($d1,$d2)"; inner.lessThan(d1, d2)
    }
    override def lessThanBatch(d: Double, ds: Array[Double]): Array[Boolean] = {
      log += s"LessThanBatch($d,[${ds.mkString(",")}])"; inner.lessThanBatch(d, ds)
    }
  }

  /** Does NOT override foreachLink: the read path must reach the store
    * through G3 getLinks, and the recording proves it does. */
  private final class RecordingGraph(
      inner: GraphStore,
      log: collection.mutable.Buffer[String]) extends GraphStore {
    override def getEntryPoint: Option[EntryPoint] = {
      log += "GetEntryPoint"; inner.getEntryPoint
    }
    override def setEntryPoint(point: Long, layer: Int): Unit = {
      log += s"SetEntryPoint($point,$layer)"; inner.setEntryPoint(point, layer)
    }
    override def getLinks(base: Long, lc: Int): FurthestQueue = {
      log += s"GetLinks($base,$lc)"; inner.getLinks(base, lc)
    }
    override def setLinks(base: Long, links: FurthestQueue, lc: Int): Unit = {
      log += s"SetLinks($base,[${links.toArray.map(_.dst).mkString(",")}],$lc)"
      inner.setLinks(base, links, lc)
    }
    override def numLayers: Int = { log += "NumLayers"; inner.numLayers }
  }

  private val params = HnswParams.standard(efConstruction = 64, efSearch = 32, m = 16)

  test("search_to_insert on an empty store: GetEntryPoint, then the empty result" +
    " (coroutine.rs:218-240)") {
    val log = collection.mutable.Buffer.empty[String]
    val vectors = new RecordingVectorStore(
      new LongValueStore(Map(0L -> 0L)), log)
    val graph = new RecordingGraph(new InMemoryGraph, log)

    val searcher = new HnswSearcher(params)
    val (links, setEp) = searcher.searchToInsert(vectors, graph, q = 0L,
      insertionLayer = 0)

    assert(log.toSeq === Seq("GetEntryPoint"))
    assert(links.size === 1 && links.head.isEmpty, "one empty layer queue")
    assert(setEp, "vector must become the entry point")
  }

  test("search_to_insert against one entry point: GetEntryPoint →" +
    " eval → compare → expand, exact payloads (coroutine.rs:242-304)") {
    // graph: entry 0 @ layer 0, links 0 -> [1, 2]; values give exact
    // integer distances from query 3 (value 11): d0=1, d1=3, d2=9.
    val vals = Map(0L -> 10L, 1L -> 14L, 2L -> 20L, 3L -> 11L)
    val base = new InMemoryGraph
    base.setEntryPoint(0L, 0)
    base.setLinks(0L, FurthestQueue.fromAscending(
      Seq(Neighbor(1L, 4.0), Neighbor(2L, 10.0))), 0)

    val log = collection.mutable.Buffer.empty[String]
    val vectors = new RecordingVectorStore(new LongValueStore(vals), log)
    val graph = new RecordingGraph(base, log)

    val searcher = new HnswSearcher(params)
    val (links, setEp) = searcher.searchToInsert(vectors, graph, q = 3L,
      insertionLayer = 0)

    assert(log.toSeq === Seq(
      "GetEntryPoint",            // S4 searchInit
      "EvalDistance(3,0)",        //   entry distance (the ref batches this one)
      "LessThan(1.0,1.0)",        // S5 pop entry: nearest-vs-furthest gate
      "GetLinks(0,0)",            //   expand entry's neighborhood
      "EvalDistanceBatch(3,[1,2])", // batched neighbor eval (ref :255)
      "LessThan(9.0,3.0)",        // pop node 1 (its links: none)
      "GetLinks(1,0)",
      "EvalDistanceBatch(3,[])",
      "LessThan(9.0,9.0)",        // pop node 2
      "GetLinks(2,0)",
      "EvalDistanceBatch(3,[])"
    ))
    assert(!setEp, "existing entry point keeps the root")
    assert(links.size === 1)
    assert(links.head.toArray.map(n => (n.dst, n.dist)).toSeq ===
      Seq((0L, 1.0), (1L, 3.0), (2L, 9.0)))
  }

  test("full insert issues the mutation ops after the search phase" +
    " (hawk_searcher.rs:311-332 via the op vocabulary)") {
    val log = collection.mutable.Buffer.empty[String]
    val vectors = new RecordingVectorStore(
      new LongValueStore(Map(7L -> 42L)), log)
    val graph = new RecordingGraph(new InMemoryGraph, log)

    val searcher = new HnswSearcher(params)
    searcher.insert(vectors, graph, q = 7L, insertionLayer = 0)

    assert(log.toSeq === Seq(
      "GetEntryPoint",        // search phase (empty store: nothing to walk)
      "Insert(7)",            // V1 persist the staged query
      "SetEntryPoint(7,0)",   // S8 mutation phase: first vector roots the graph
      "SetLinks(7,[],0)"      // S9 connect_bidir: own (empty) neighbor list
    ))
  }
}
