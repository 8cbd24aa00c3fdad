package graft.hnsw

import org.scalatest.funsuite.AnyFunSuite

/** The kernel's primitive visited set vs the reference semantics of a
  * Set[Long] — including the Long.MinValue sentinel edge and growth. */
class LongSetSpec extends AnyFunSuite {

  test("add returns true exactly once per distinct value; contains agrees") {
    val s = new LongSet()
    assert(s.add(5L)); assert(!s.add(5L))
    assert(s.add(-7L)); assert(!s.add(-7L))
    assert(s.add(0L)); assert(!s.add(0L))
    assert(s.contains(5L) && s.contains(-7L) && s.contains(0L))
    assert(!s.contains(6L) && !s.contains(Long.MaxValue))
    assert(s.size == 3)
  }

  test("Long.MinValue (the empty-slot sentinel) is a valid member") {
    val s = new LongSet()
    assert(!s.contains(Long.MinValue))
    assert(s.add(Long.MinValue))
    assert(!s.add(Long.MinValue))
    assert(s.contains(Long.MinValue))
    assert(s.size == 1)
  }

  test("growth: stays correct across many inserts (vs scala Set oracle)") {
    val rnd = new scala.util.Random(41)
    (1 to 50).foreach { _ =>
      val s = new LongSet(4)
      val oracle = scala.collection.mutable.Set.empty[Long]
      // mixed distribution: clustered small ids (dup-heavy) + full-range
      val xs = List.fill(rnd.nextInt(400))(
        if (rnd.nextBoolean()) rnd.nextInt(50).toLong else rnd.nextLong())
      xs.foreach { x =>
        assert(s.add(x) == oracle.add(x), s"add($x) disagreed")
      }
      assert(s.size == oracle.size)
      oracle.foreach(x => assert(s.contains(x)))
    }
  }

  test("dense sequential ids (the build's actual key shape) at scale") {
    val s = new LongSet(64)
    (0L until 100000L).foreach(i => assert(s.add(i)))
    (0L until 100000L).foreach(i => assert(!s.add(i)))
    assert(s.size == 100000)
    assert(!s.contains(100001L))
  }
}
