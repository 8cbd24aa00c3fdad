package graft.hnsw

/** The predicated-serving census machinery shared by all three routed
  * serving tiers — float ([[HnswRouted.serveShard]]), u64 Hamming codes
  * ([[HnswRoutedCodes]]) and PQ/ADC ([[HnswRoutedPq]]). One kernel,
  * parameterized over the member representation, so a fix lands once
  * instead of three hand-synced times (the round-15 failure mode:
  * "iterate the smaller side" was one fix applied three times by hand,
  * and the small-allow eligibleIds fast path then missed the PQ copy).
  *
  * Contract per predicated shard serve:
  *  - `eligible(id)`: allowed (sorted allow-set membership when an
  *    allow-set rides) AND not tombstoned (sorted dead-set membership).
  *  - `eligibleCount`: ONE census per shard, iterating the SMALLER
  *    side — a label partition's allow-set can be 16M ids (the
  *    driver-path ceiling) while a cell holds tens of thousands;
  *    walking the allow array per cell would cost O(|allow| × nCells)
  *    across the batch where walking the cell's keys costs
  *    O(cellN log |allow|), and vice versa for tiny allow-sets.
  *  - `eligibleIds`: materialized lazily, ONCE per shard, and only if
  *    some query needs an exact scan (per-query whole-cell
  *    re-filtering was a measured 2.5× serving tax concentrated in the
  *    mostly-dead cells' tasks). Takes the small-allow fast path too:
  *    with a tiny allow-set in the exhaustive/exact-scan regime,
  *    iterating the cell's keys would pay O(cellN log |allow|) per
  *    shard where O(|allow| log dead) suffices.
  *  - `cutoverToExact`: the density-aware regime switch — a cell whose
  *    eligible FRACTION is low defeats the beam (the top-beam of a
  *    98%-dead cell holds ~no eligible ids, so nearly every query
  *    escalated to full cell width; measured: 455 escalations for 320
  *    queries in one wiped cell — a 1.4 s straggler task). The exact
  *    scan is O(eligible) per query and wins decisively below ~25%
  *    density.
  *  - [[exactScanTopK]]: k-bounded queue selection, not a full sort
  *    (sorting all eligible ids as boxed tuples per query cost ~10 ms
  *    at 15k eligible); the queue keeps the oracle's total (dist, id)
  *    order at the boundary, load-bearing under INTEGER Hamming
  *    distances where ties are the common case.
  */
private[hnsw] object PredicatedCensus {

  /** Minimal read view of one cell's member-id set — the only part of
    * the member representation the census needs. */
  trait Members {
    def size: Int
    def contains(id: Long): Boolean
    def foreachKey(f: Long => Unit): Unit
  }

  object Members {
    def ofVecMap(m: LongVecMap): Members =
      new Members {
        def size: Int = m.size
        def contains(id: Long): Boolean = m.contains(id)
        def foreachKey(f: Long => Unit): Unit = m.foreachKey(f)
      }
    def ofLongLongMap(m: LongLongMap): Members =
      new Members {
        def size: Int = m.size
        def contains(id: Long): Boolean = m.contains(id)
        def foreachKey(f: Long => Unit): Unit = m.foreach((id, _) => f(id))
      }
  }

  /** Per-shard eligibility census over `allow` (sorted; consulted only
    * when `hasAllow`) and `dead` (sorted tombstones). Constructed once
    * per shard serve; `eligibleIds` stays unmaterialized unless an
    * exact scan runs. */
  final class Census(m: Members, hasAllow: Boolean,
                     allow: Array[Long], dead: Array[Long]) {

    val cellN: Int = m.size

    @inline def eligible(id: Long): Boolean =
      (!hasAllow || java.util.Arrays.binarySearch(allow, id) >= 0) &&
        (dead.length == 0 || java.util.Arrays.binarySearch(dead, id) < 0)

    /** Eligible-member count — iterates the smaller of (allow, cell). */
    val eligibleCount: Int =
      if (hasAllow) {
        if (allow.length <= cellN)
          allow.count(id => m.contains(id) &&
            (dead.length == 0 || java.util.Arrays.binarySearch(dead, id) < 0))
        else {
          var c = 0
          m.foreachKey(id => if (eligible(id)) c += 1)
          c
        }
      }
      else if (dead.length == 0) cellN
      else cellN - dead.count(m.contains)

    /** Materialized once, on first exact scan; smaller-side iteration
      * like the count (the allow array is sorted, and the map-key path
      * is unordered — both are fine: every consumer is a total-order
      * queue selection, order-independent by construction). */
    lazy val eligibleIds: Array[Long] = {
      val b = Array.newBuilder[Long]
      if (hasAllow && allow.length <= cellN)
        // iterating the allow array IS the allow check — only the
        // dead-set probe remains (eligible() would redo the allow
        // binary search the iteration already answered)
        allow.foreach(id => if (m.contains(id) &&
          (dead.length == 0 || java.util.Arrays.binarySearch(dead, id) < 0)) b += id)
      else m.foreachKey(id => if (eligible(id)) b += id)
      b.result()
    }

    /** Density-aware cutover: serve by exact scan when the eligible set
      * is smaller than the beam or below ~25% of the cell. */
    def cutoverToExact(beam: Int): Boolean =
      eligibleCount <= math.max(beam, cellN / 4)
  }

  /** k-bounded exact selection over `eligibleIds`: one primitive
    * admission compare rejects almost every candidate; the returned
    * queue carries the total (dist, id) order at the boundary. */
  def exactScanTopK(eligibleIds: Array[Long], k: Int,
                    dist: Long => Double): FurthestQueue = {
    val fq = new FurthestQueue()
    var i = 0
    while (i < eligibleIds.length) {
      val id = eligibleIds(i)
      val d = dist(id)
      if (fq.size < k || d < fq.furthestDist ||
          (d == fq.furthestDist && id < fq.dstAt(fq.size - 1))) {
        fq.insert(id, d)
        fq.trimToKNearest(k)
      }
      i += 1
    }
    fq
  }
}
