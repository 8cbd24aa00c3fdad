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

  test("t_cms_tokens audit row: one-sided holds exactly, overestimate inside the envelope") {
    val row = SparkEntry.queries("t_cms_tokens")(spark, sfDir).head()
    assert(row.getLong(row.fieldIndex("n_under")) == 0L,
      "CMS underestimated a count — impossible by construction, a bug")
    assert(row.getLong(row.fieldIndex("n_terms")) > 0)
    val maxOverBp = row.getLong(row.fieldIndex("max_over_bp"))
    val boundBp = row.getLong(row.fieldIndex("bound_bp"))
    // per-query envelope holds w.p. >= 1 - e^-4 per token; allow the max
    // over ALL distinct tokens a 3x slack so the floor is stable
    assert(maxOverBp <= 3 * boundBp, s"max_over_bp=$maxOverBp bound_bp=$boundBp")
  }

  test("e_value_sketch_quantiles: every sketched quantile's rank miss is inside the GK bound") {
    val rows = SparkEntry.queries("e_value_sketch_quantiles")(spark, sfDir).collect()
    assert(rows.length >= 10) // 5 event types x 2 quantiles
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      val miss = r.getLong(r.fieldIndex("miss_rows"))
      // GK: rank error <= n/accuracy (acc=10000), +1 row for the
      // ceil in the target-rank definition
      assert(miss <= n / 10000 + 1,
        s"${r.getString(0)} q=${r.getLong(1)}: miss_rows=$miss n=$n")
    }
  }

  test("e_kmv_users: estimator error inside its own bound_bp on every row") {
    val rows = SparkEntry.queries("e_kmv_users")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getLong(r.fieldIndex("err_bp"))
      val bound = r.getLong(r.fieldIndex("bound_bp"))
      assert(err <= bound,
        s"${r.getString(0)}: KMV err $err bp > bound $bound bp")
      assert(r.getLong(r.fieldIndex("n_exact")) > 0)
    }
  }

  test("d_source_overlap_kmv: Jaccard estimates track the exact hash-space Jaccard") {
    val rows = SparkEntry.queries("d_source_overlap_kmv")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per-pair KMV Jaccard is a k-sample binomial: sd ~ sqrt(J/k) — with
    // k=256 and J up to ~0.1 that is ~200 bp; allow 4 sigma plus the
    // 1-sample quantization floor (1/k = ~39 bp)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("jaccard_bp_exact"))
      val err = r.getLong(r.fieldIndex("err_bp"))
      val sigmaBp = math.sqrt(math.max(exact, 39L) / 10000.0 / 256.0) * 10000
      assert(err <= 4 * sigmaBp + 40,
        s"${r.getString(0)}-${r.getString(1)}: err $err bp vs exact $exact bp")
    }
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
