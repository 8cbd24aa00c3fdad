package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Sketch-family checks: the rows-only catalog entries whose output row
  * carries its own verification number (the recall_bp discipline). */
class SketchSpec extends SparkSpec {

  test("e_hll_users sketch error stays inside the 2%-rsd envelope") {
    val row = SparkEntry.queries("e_hll_users")(spark, sfDir).head()
    val errBp = row.getLong(row.fieldIndex("err_bp"))
    // rsd 0.02 => typical error ~2sigma = 4%; 500 bp (5%) is the hard line
    assert(errBp <= 500L, s"HLL error $errBp bp vs exact")
    assert(row.getLong(row.fieldIndex("n_exact")) > 0)
  }

  test("e_hll_users is deterministic across partitionings (register merge is commutative)") {
    val a = SparkEntry.queries("e_hll_users")(spark, sfDir).head().getLong(1)
    val again = SparkEntry.queries("e_hll_users")(spark, sfDir).head().getLong(1)
    assert(a == again)
  }
}
