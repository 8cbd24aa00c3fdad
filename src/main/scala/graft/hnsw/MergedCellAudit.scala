package graft.hnsw

/** The float-space merged-cell separability kernel shared by the float
  * tier ([[HnswRouted.mergedCellAudit]]) and the PQ tier
  * ([[HnswRoutedPq.mergedCellAudit]], which runs it over code
  * RECONSTRUCTIONS — decode is 16 centroid lookups per member, and the
  * dead/live mode separation the audit hunts is orders of magnitude
  * above the quantization radius, so the census answer is the same one
  * the raw floats would give without ever touching the float source).
  * One kernel instead of hand-synced copies — the [[PredicatedCensus]]
  * extraction discipline applied to the audit (the round-15 failure
  * mode: the same fix applied three times by hand missed one copy).
  *
  * The algorithm (measured rationale in [[HnswRouted.mergedCellAudit]]'s
  * Scaladoc): deterministic `kSplit`-means over a hash-decimated sample
  * whose first two seeds are the dead-member and live-member means (the
  * hypothesis-shaped init; k > 2 is load-bearing for cells that merged
  * SEVERAL clusters), then a full-member purity census per component.
  * Flagged `merged` when ≥80%-pure-dead components hold ≥80% of the
  * dead mass beside a clearly-live (≤20% dead) component. */
private[hnsw] object MergedCellAudit {

  /** Audit one cell's members. `all` is the cell's full (id, vec) set,
    * id-sorted (determinism of the sample + seeds). Returns
    * (hi_dead_bp, lo_dead_bp, dead_mass_hi_bp, merged). */
  def auditCell(all: Array[(Long, Array[Float])],
                metric: (Array[Float], Array[Float]) => Double,
                isDead: Long => Boolean, nDead: Int,
                sampleMax: Int, iters: Int, kSplit: Int)
      : (Long, Long, Long, Boolean) = {
    // deterministic sample, decimated by ID HASH — never by position: a
    // positional stride can alias with the id pattern (a cell of
    // interleaved (32k dead, 32k+1 live) pairs sampled every 6th
    // position yields ALL-dead, the live seed-mean degenerates to zero,
    // and Lloyd collapses to one side — exactly the planted rehearsal
    // case). Falls back to the full cell if the sample still misses a
    // class (cells are bounded by maxCellRows, so O(cell x dim) stays
    // affordable).
    val keep = math.min(1.0, sampleMax.toDouble / all.length)
    val hashed = all.filter { case (id, _) =>
      HnswSearcher.uniformFromHash(id, 0x9E3779B9L) < keep }
    val sample =
      if (hashed.length >= 32 && hashed.exists(r => isDead(r._1)) &&
          hashed.exists(r => !isDead(r._1))) hashed
      else all
    val dim = sample.head._2.length
    def meanOf(p: ((Long, Array[Float])) => Boolean): Array[Float] = {
      val acc = new Array[Double](dim); var n = 0
      sample.foreach { r => if (p(r)) {
        var d = 0; while (d < dim) { acc(d) += r._2(d); d += 1 }; n += 1 } }
      if (n == 0) new Array[Float](dim)
      else Array.tabulate(dim)(d => (acc(d) / n).toFloat)
    }
    val k = math.max(2, math.min(kSplit, sample.length / 4))
    val cents = Array.ofDim[Array[Float]](k)
    cents(0) = meanOf(r => isDead(r._1))   // dead-member mean
    cents(1) = meanOf(r => !isDead(r._1))  // live-member mean
    // farthest-point seeds (deterministic; ties by id order): the
    // extra components catch structure the two hypothesis seeds
    // cannot hold alone when >2 clusters share the cell
    var j = 2
    while (j < k) {
      var best: Array[Float] = null; var bestD = -1.0
      sample.foreach { case (_, v) =>
        var minD = Double.MaxValue; var c = 0
        while (c < j) { val d = metric(v, cents(c)); if (d < minD) minD = d; c += 1 }
        if (minD > bestD) { bestD = minD; best = v }
      }
      cents(j) = best; j += 1
    }
    @inline def nearest(v: Array[Float]): Int = {
      var bi = 0; var bd = Double.MaxValue; var c = 0
      while (c < k) {
        val d = metric(v, cents(c)); if (d < bd) { bd = d; bi = c }; c += 1 }
      bi
    }
    var it = 0
    while (it < iters) {
      val accs = Array.fill(k)(new Array[Double](dim))
      val ns = new Array[Int](k)
      sample.foreach { case (_, v) =>
        val c = nearest(v); val acc = accs(c)
        var d = 0; while (d < dim) { acc(d) += v(d); d += 1 }
        ns(c) += 1
      }
      var c = 0
      while (c < k) {
        if (ns(c) > 0)
          cents(c) = Array.tabulate(dim)(d => (accs(c)(d) / ns(c)).toFloat)
        c += 1 // an empty component keeps its centroid
      }
      it += 1
    }
    // census EVERY member (not just the sample) per component
    val compN = new Array[Long](k); val compDead = new Array[Long](k)
    all.foreach { case (id, v) =>
      val c = nearest(v)
      compN(c) += 1; if (isDead(id)) compDead(c) += 1
    }
    var hiBp = 0L; var loBp = 10000L; var pureDeadMass = 0L
    var c = 0
    while (c < k) {
      if (compN(c) > 0) {
        val bp = compDead(c) * 10000L / compN(c)
        if (bp > hiBp) hiBp = bp
        if (bp < loBp) loBp = bp
        if (bp >= 8000L) pureDeadMass += compDead(c)
      }
      c += 1
    }
    val massHiBp = if (nDead == 0) 0L else pureDeadMass * 10000L / nDead
    val merged = hiBp >= 8000L && loBp <= 2000L && massHiBp >= 8000L
    (hiBp, loBp, massHiBp, merged)
  }
}
