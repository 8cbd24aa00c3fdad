package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's one-time-cost attribution rests on two ledger
  * properties: entries record EXCLUSIVE time under nesting (so a
  * query's entries sum to its one-time wall and are never
  * double-subtracted), and failed builds record nothing (the memo
  * rejects them too). */
class BuildLedgerSpec extends AnyFunSuite {

  private def spin(ms: Long): Unit = {
    val end = System.nanoTime() + ms * 1000000L
    while (System.nanoTime() < end) {}
  }

  test("nested timed() records exclusive seconds per entry") {
    val mark = BuildLedger.size
    BuildLedger.timed("outer") {
      spin(30)
      BuildLedger.timed("inner") { spin(60) }
      spin(30)
    }
    val entries = BuildLedger.since(mark)
    assert(entries.map(_.label) === Seq("inner", "outer"))
    val inner = entries.head.seconds
    val outer = entries.last.seconds
    assert(inner >= 0.055, s"inner $inner")
    // outer must EXCLUDE the inner 60ms: ~60ms of its own work, and
    // the two entries must sum to the true wall, not double-count
    assert(outer >= 0.055 && outer < 0.11, s"outer $outer not exclusive")
  }

  test("a throwing build records nothing but still credits the enclosing build") {
    val mark = BuildLedger.size
    BuildLedger.timed("parent") {
      spin(20)
      intercept[RuntimeException] {
        BuildLedger.timed("failing") { spin(40); throw new RuntimeException("boom") }
      }
    }
    val entries = BuildLedger.since(mark)
    assert(entries.map(_.label) === Seq("parent"))
    // the failed child's 40ms wall belongs to the parent's wall-clock
    // but its own entry must not exist; parent records its exclusive
    // time MINUS the aborted child's (the child popped its frame and
    // credited its total upward)
    assert(entries.head.seconds >= 0.015 && entries.head.seconds < 0.05,
      s"parent ${entries.head.seconds}")
  }

  test("size/since expose an append-only window") {
    val before = BuildLedger.size
    BuildLedger.timed("w1") { spin(1) }
    BuildLedger.timed("w2") { spin(1) }
    assert(BuildLedger.since(before).map(_.label) === Seq("w1", "w2"))
    assert(BuildLedger.size === before + 2)
  }
}
