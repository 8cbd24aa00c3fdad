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
  * 500 ms — at any real scale (serves in seconds) the ratio governs. */
class WarmFirstServeSpec extends SparkSpec {

  test("warmed+probed first serve stays within 3x steady (30000 bp ceiling)") {
    val row = graft.queries.Hnsw.defs("h_warm_first_serve")(spark, sfDir)
      .collect().head
    val first = row.getAs[Long]("first_ms")
    val steady = row.getAs[Long]("steady_ms")
    val bp = row.getAs[Long]("first_over_steady_bp")
    assert(bp <= 30000L || first - steady <= 500L,
      s"cold-tax regression: warmed first serve ${first}ms vs steady " +
        s"${steady}ms = ${bp}bp (ceiling 30000bp + 500ms absolute slack) — " +
        "the covering-probe warm-up is no longer paying the kernel/plan ramp")
  }
}
