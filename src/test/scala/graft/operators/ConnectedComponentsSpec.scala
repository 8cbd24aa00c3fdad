package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  /** collectMax = -1 pins the DISTRIBUTED loop (the round-19 driver
    * cutover would otherwise absorb every test-sized graph); the default
    * path is covered by the cutover-parity test below. */
  private def components(edges: Seq[(Long, Long)],
                         collectMax: Long = -1L): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"), collectMax = collectMax)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Independent oracle: driver-side union-find. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("two clusters and a chain resolve to min-id labels") {
    // cluster {1,2,3} (triangle), chain 10-11-12-13, isolated pair {20,21}
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3),
      (10, 11), (11, 12), (12, 13),
      (21, 20))
    val got = components(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("agrees with union-find on a random graph") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(120)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    assert(components(edges) == unionFind(edges))
  }

  test("self-loops and duplicate edges are harmless") {
    val edges = Seq[(Long, Long)]((5, 5), (5, 6), (6, 5), (5, 6))
    assert(components(edges) == Map(5L -> 5L, 6L -> 5L))
  }

  test("long path converges within the iteration budget") {
    // path 0-1-2-...-19: worst diameter for min-propagation
    val edges = (0L until 19L).map(i => (i, i + 1))
    val got = components(edges)
    assert(got.values.toSet == Set(0L) && got.size == 20)
  }

  test("a vertex whose only edge is a self-loop is a singleton component") {
    // exact-dup matchers can emit a ~ a; the contract promises a row for
    // every vertex appearing in edges
    val edges = Seq[(Long, Long)]((7, 7), (1, 2))
    assert(components(edges) == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("driver cutover (round-19) matches the distributed loop exactly") {
    // the same random graph through BOTH paths: the bounded union-find
    // must reproduce the loop's (id, comp=min id) rows bit-for-bit —
    // rows, labels, and the vertex universe
    val rng = new scala.util.Random(41)
    val edges = (Seq.fill(200)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      ++ Seq((300L, 300L))) // self-loop-only singleton
    val viaDriver = components(edges, collectMax = ConnectedComponents.CollectEdgeMax)
    val viaLoop = components(edges, collectMax = -1L)
    assert(viaDriver == viaLoop)
  }

  test("exceeding the iteration budget fails loudly, never silently partial") {
    import spark.implicits._
    // path of diameter 9 with maxIter = 3: cannot converge
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.run(edges, maxIter = 3, collectMax = -1L)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
