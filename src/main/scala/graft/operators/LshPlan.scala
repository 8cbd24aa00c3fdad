package graft.operators

/** Closed-form SimHash-LSH banding calculator: turns an operating point
  * `(similarity threshold, target recall)` into a concrete `(bands,
  * rowsPerBand)` banding, so callers of [[Dedup.neardupLsh]] state WHAT
  * they need and the OR-amplification math — previously a comment next
  * to hand-picked constants — picks the parameters.
  *
  * Math (Charikar's SimHash / random-hyperplane LSH, public): two unit
  * vectors at cosine similarity `s` agree on one signature bit with
  * probability
  *
  *     p(s) = 1 - arccos(s) / pi
  *
  * so a band of `r` bits collides with probability `p^r`, and with `b`
  * independent bands the pair is found with probability
  *
  *     recall(s, b, r) = 1 - (1 - p^r)^b        (the per-pair miss
  *                                               bound is (1 - p^r)^b)
  *
  * Choosing the banding: for each feasible `r` the minimal band count
  * meeting the target follows from inverting the miss bound,
  *
  *     b(r) = ceil( ln(1 - recall) / ln(1 - p^r) )
  *
  * and among the `(b(r), r)` candidates that fit the signature
  * (`b*r <= nBits`) we take the one minimizing the expected candidate
  * cost. Cost model: each band contributes `n` shuffled rows plus, for
  * every unrelated pair, a background collision with probability
  * `pBg^r` where `pBg = p(0) = 0.5` (random high-dim vectors are near
  * orthogonal) — so
  *
  *     cost(r) = b(r) * [ n  +  w * (n*(n-1)/2) * 0.5^r ]
  *
  * with `w` the relative cost of one in-map exact verify vs one
  * shuffled row. The optimum is interior: small `r` drowns in
  * background collisions, large `r` needs exponentially many bands.
  */
object LshPlan {

  /** A chosen banding plus its guarantees at the planning threshold:
    * `missBound` = (1-p^r)^b (probability a qualifying pair at exactly
    * the threshold is never candidate-paired — pairs MORE similar than
    * the threshold have strictly smaller miss probability), and the
    * modeled background candidate count per unrelated pair. */
  final case class Plan(bands: Int, rowsPerBand: Int,
                        missBound: Double, bgCandidatesPerPair: Double) {
    def recallBound: Double = 1.0 - missBound
    def bitsUsed: Int = bands * rowsPerBand
  }

  /** p(s) = 1 - arccos(s)/pi — per-bit collision probability at cosine
    * similarity s. */
  def bitCollisionProb(s: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, s))) / math.Pi

  /** recall(s, b, r) = 1 - (1 - p^r)^b. */
  def recall(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - missProb(s, bands, rowsPerBand)

  /** The per-pair miss bound (1 - p^r)^b at similarity s. */
  def missProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    math.pow(1.0 - math.pow(bitCollisionProb(s), rowsPerBand), bands)

  /** Minimal band count so recall(threshold, b, r) >= targetRecall:
    * b = ceil(ln(1-rho) / ln(1-p^r)). log1p keeps precision when the
    * per-band hit rate p^r is small. */
  def bandsFor(threshold: Double, targetRecall: Double, rowsPerBand: Int): Int = {
    require(targetRecall > 0 && targetRecall < 1, "targetRecall in (0,1)")
    val perBand = math.pow(bitCollisionProb(threshold), rowsPerBand)
    require(perBand > 0, "threshold -1 never collides")
    math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-perBand)).toInt)
  }

  /** Pick `(bands, rowsPerBand)` for the operating point. `n` is the
    * expected corpus size (the cost model's shuffle-vs-verify balance
    * shifts with it); `verifyWeight` is the cost of one exact-cosine
    * verify relative to one shuffled candidate row. Both only tilt the
    * choice among FEASIBLE plans — every returned plan meets the recall
    * target by the closed-form bound. */
  def plan(threshold: Double, targetRecall: Double, nBits: Int = 512,
           n: Long = 1000000L, verifyWeight: Double = 1.0): Plan = {
    require(nBits >= 1, "nBits >= 1")
    // 63, not 64: the fused SimHashBandsF32 kernel packs band values into
    // signed longs and rejects rowsPerBand = 64, so a 64-row plan would
    // be unexecutable by the operator this calculator feeds
    val candidates = (1 to 63).flatMap { r =>
      val b = bandsFor(threshold, targetRecall, r)
      if (b.toLong * r <= nBits) {
        val bg = b * math.pow(0.5, r)
        val cost = b * (n.toDouble + verifyWeight * (n.toDouble * (n - 1) / 2.0) * math.pow(0.5, r))
        Some((cost, Plan(b, r, missProb(threshold, b, r), bg)))
      } else None
    }
    require(candidates.nonEmpty,
      s"no banding fits $nBits bits at threshold=$threshold recall=$targetRecall")
    candidates.minBy(_._1)._2
  }
}
