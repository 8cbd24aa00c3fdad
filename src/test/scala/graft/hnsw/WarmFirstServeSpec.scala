package graft.hnsw

import graft.SparkSpec

/** Ceiling on the cold-tax watch row: `h_warm_first_serve` carries
  * `first_over_steady_bp` every round, but a watch row nobody must
  * read can regress silently — this spec makes the suite fail instead.
  * Bar: 30000 bp (3x steady), generous against the measured
  * ~12000-14000 bp at the decade rungs, so only a genuine cold-tax
  * regression (the pre-probe class measured 4.0x cold) trips it.
  * Micro-timing guard: at sf0.001 a serve is tens of milliseconds and
  * scheduler jitter alone can breach a pure ratio, so a ratio breach
  * only fails when the absolute first-minus-steady gap also exceeds
  * 500 ms — at any real scale (serves in seconds) the ratio governs.
  * Retry-once guard (round-19): under the suite's PARALLEL-SUITE JVM
  * (sbt runs suites concurrently on one SparkContext) a contention
  * window can inflate the one-shot `first` measurement past even the
  * absolute slack — observed once at 8279 ms first / 2437 ms steady on
  * a 32-suite run whose isolated re-run passed. A genuine cold-tax
  * regression breaches on EVERY fresh build, so the spec re-measures
  * from a fresh build once and fails only when both attempts breach —
  * the regression-catching property is intact, the contention-flake
  * probability is squared. */
class WarmFirstServeSpec extends SparkSpec {

  test("warmed+probed first serve stays within 3x steady (30000 bp ceiling)") {
    def measure(): (Long, Long, Long) = {
      val row = graft.queries.Hnsw.defs("h_warm_first_serve")(spark, sfDir)
        .collect().head
      (row.getAs[Long]("first_ms"), row.getAs[Long]("steady_ms"),
        row.getAs[Long]("first_over_steady_bp"))
    }
    def ok(first: Long, steady: Long, bp: Long): Boolean =
      bp <= 30000L || first - steady <= 500L
    val (first1, steady1, bp1) = measure()
    if (!ok(first1, steady1, bp1)) {
      val (first, steady, bp) = measure()
      assert(ok(first, steady, bp),
        s"cold-tax regression on BOTH fresh-build attempts: warmed first " +
          s"serve ${first1}ms/${first}ms vs steady ${steady1}ms/${steady}ms " +
          s"= ${bp1}bp/${bp}bp (ceiling 30000bp + 500ms absolute slack) — " +
          "the covering-probe warm-up is no longer paying the kernel/plan ramp")
    }
  }
}
