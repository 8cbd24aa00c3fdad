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

  test("HLL estimate is invariant to partitioning (register merge is commutative)") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$sfDir/events.parquet").select(col("user_id"))
    def approx(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    val a = approx(ev.repartition(2))
    val b = approx(ev.repartition(19))
    assert(a == b, s"HLL estimate differs across partitionings: $a vs $b")
  }
}
