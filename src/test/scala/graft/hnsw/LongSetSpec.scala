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

  test("LongLongMap: put/apply/contains/toSeq vs mutable.Map oracle, sentinel key included") {
    val rnd = new scala.util.Random(43)
    (1 to 30).foreach { _ =>
      val m = new LongLongMap(4)
      val oracle = scala.collection.mutable.Map.empty[Long, Long]
      (1 to rnd.nextInt(300)).foreach { _ =>
        val k = if (rnd.nextInt(20) == 0) Long.MinValue
                else if (rnd.nextBoolean()) rnd.nextInt(40).toLong else rnd.nextLong()
        val v = rnd.nextLong()
        m.put(k, v); oracle(k) = v // last write wins, both sides
      }
      assert(m.size == oracle.size)
      oracle.foreach { case (k, v) =>
        assert(m.contains(k) && m(k) == v, s"key $k")
      }
      assert(m.toSeq.sortBy(_._1) == oracle.toSeq.sortBy(_._1))
      assert(!m.contains(999999999999L))
      intercept[NoSuchElementException](m(999999999999L))
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
