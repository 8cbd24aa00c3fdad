package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Asymmetric containment detection: document A is contained in B when
  * `|S(A) ∩ S(B)| / |S(A)| >= t` over distinct character shingles — the
  * web-corpus duplication mode symmetric Jaccard misses (a page quoting
  * another page whole, boilerplate-wrapped mirrors, truncated copies).
  *
  * Exact inverted-index shape: explode distinct shingles, self-join on
  * the shingle (each shared shingle contributes one pair row), one
  * aggregate for intersection sizes, then BOTH directions' containment
  * from a single intersection count plus the two set sizes. The
  * threshold compare is cross-multiplied integer arithmetic
  * (`n_inter * den >= n_set * num`), no floats anywhere.
  *
  * Scale: the join fan-out is sum over shingles of df^2 — bounded in
  * real corpora by dropping non-discriminative high-df shingles
  * (`maxDf`), the standard inverted-index cap; capped mode removes those
  * shingles from BOTH the intersection and the set sizes, so the ratio
  * stays a true containment over the kept shingle space. The cap is
  * SQL-expressible (one df CTE), so the catalog runs CAPPED (df <= 200,
  * mirrored in the d_containment oracle): at sf0.1 that cuts the join
  * 75x (561M -> 7.4M rows) and loses zero true containments — contained
  * docs share rare shingles.
  */
object Containment {

  /** Containment pairs at threshold `num/den`. Output one row per
    * directed containment: (contained_id, container_id, n_shared,
    * containment_bp). */
  def pairs(docs: DataFrame, shingleLen: Int = 8,
            num: Int = 4, den: Int = 5,
            maxDf: Int = Int.MaxValue): DataFrame = {
    require(num > 0 && den >= num, "threshold num/den must be in (0, 1]")
    pairsExact(explodedShingles(docs, shingleLen), num, den, maxDf)
  }

  /** (doc_id, s) distinct shingle-hash rows — the shared front end of
    * both routes. */
  private def explodedShingles(docs: DataFrame, shingleLen: Int): DataFrame =
    // charShingleHashes is array_distinct per doc, so (doc_id, s) is
    // already unique after the explode — no dedup shuffle needed. The
    // shingle is 64-bit-HASHED inside the per-doc transform, before the
    // distinct: the in-doc dedup compares longs, no string array ever
    // materializes, and the df-cap groupBy, the checkpoint, and the
    // self-join all move 8-byte keys instead of raw shingle strings.
    // Counting intersections over hashes equals counting over strings
    // absent a 64-bit collision (P ~ n^2/2^65 — immaterial even at
    // 100 TB), so the string-keyed oracle still applies (the
    // d_source_overlap argument).
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFunctions.charShingleHashes(col("text"), shingleLen)).as("s"))

  private def pairsExact(exploded: DataFrame, num: Int, den: Int,
                         maxDf: Int): DataFrame = {
    // Two physical shapes for the same exact semantics:
    //
    // CAPPED (the at-scale regime): the df cap needs a groupBy(s)
    // anyway, so fuse the whole inverted index into that ONE wide
    // shuffle — collect each shingle's doc list, the cap is a free
    // size(ds) filter, set sizes re-explode the (much narrower) group
    // rows, and ordered pairs are generated MAP-SIDE from the sorted
    // array. vs the join shape this deletes three full-width shuffles
    // (the cap join-back and both self-join sides); per-row pair
    // materialization is bounded by maxDf^2/2 structs (200 -> <=20k).
    //
    // UNCAPPED (oracle/small-data mode): keep the self-join — a
    // degenerate shingle shared by 10^5 docs would materialize a
    // quadratic array in one row under the fused shape, while the join
    // streams the same pairs.
    val (inter, sizes) =
      if (maxDf == Int.MaxValue) {
        // kept feeds THREE consumers (both self-join sides + the size
        // agg): without the eager localCheckpoint each consumer re-runs
        // the documents scan + shingle explode from scratch — measured
        // 4x the query cost at sf0.1 (the t_tfidf diamond rule)
        val kept = exploded.localCheckpoint()
        val sz = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val in = kept.as("x").join(kept.as("y"),
            col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .agg(count(lit(1)).as("n_inter"))
        (in, sz)
      } else {
        // groups feeds the size agg + the pair generator
        val groups = exploded.groupBy(col("s"))
          .agg(collect_list(col("doc_id")).as("ds"))
          .filter(size(col("ds")) <= maxDf)
          .localCheckpoint()
        val sz = groups.select(explode(col("ds")).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        // sort ascending so generated pairs satisfy a_id < b_id; guard
        // size >= 2 BEFORE sequence(1, size-1) (Spark's sequence steps
        // DOWN when start > stop, so size=1 would yield [1, 0])
        val in = groups.filter(size(col("ds")) >= 2)
          .select(array_sort(col("ds")).as("ds"))
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ds) - 1), i -> " +
              "transform(slice(ds, i + 1, size(ds) - i), " +
              "b -> struct(element_at(ds, i) AS a_id, b AS b_id))))")).as("p"))
          .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
          .agg(count(lit(1)).as("n_inter"))
        (in, sz)
      }
    val sized = inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("a_n")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("b_n")), "b_id")
    thresholdBothDirections(sized, num, den)
  }

  /** (a_id, b_id, n_inter, a_n, b_n) -> directed containment rows.
    * Both directions from ONE pass: a union of two filters re-plans the
    * whole candidate subtree per branch; exploding each sized row into
    * its two candidate directions keeps a single subtree + one trivial
    * Generate. */
  private def thresholdBothDirections(sized: DataFrame, num: Int, den: Int): DataFrame =
    sized
      .select(col("n_inter"), explode(array(
        struct(col("a_id").as("contained_id"), col("b_id").as("container_id"),
          col("a_n").as("base_n")),
        struct(col("b_id").as("contained_id"), col("a_id").as("container_id"),
          col("b_n").as("base_n")))).as("d"))
      .filter(col("n_inter") * den >= col("d.base_n") * num)
      .select(col("d.contained_id").as("contained_id"),
        col("d.container_id").as("container_id"),
        col("n_inter").as("n_shared"),
        expr("n_inter * 10000 div d.base_n").as("containment_bp"))

  /** Candidate-pair rows the capped inverted index would materialize:
    * Σ over kept shingles of C(df, 2). ONE narrow aggregation over
    * 8-byte keys with map-side partial combine — a small, bounded
    * fraction of the pair join it predicts (the join additionally
    * materializes and re-shuffles every one of those rows). */
  def estimateCandidateRows(docs: DataFrame, shingleLen: Int = 8,
                            maxDf: Int = Int.MaxValue): Long =
    estimateFromExploded(explodedShingles(docs, shingleLen), maxDf)

  /** `sampleMod` > 1 samples the SHINGLE SPACE (keep s where
    * hash(s) % mod == 0) and scales the sum back up: per-shingle df is
    * EXACT for every sampled shingle (sampling keys, not rows), so the
    * scaled sum is an unbiased estimate with mod× less aggregation
    * state — the router's pass over a ~1e8-distinct-shingle corpus
    * drops from a spill-storm to a fast scan. mod=1 is the exact sum
    * (what [[estimateCandidateRows]] exposes). */
  private def estimateFromExploded(exploded: DataFrame, maxDf: Int,
                                   sampleMod: Int = 1): Long = {
    val base =
      if (sampleMod <= 1) exploded
      else exploded.filter(pmod(col("s"), lit(sampleMod.toLong)) === 0L)
    val c = base.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0L)).as("c"))
      .head.getAs[Number](0).longValue
    c * math.max(1, sampleMod)
  }

  /** Route pin for [[pairsAuto]]. The two routes are NOT
    * result-identical above the knee: the LSH route keeps precision 1.0
    * but its recall follows the banding curve on pair Jaccard, so
    * low-Jaccard/high-asymmetry containments can be missed. */
  sealed trait Route
  object Route {
    /** Estimate-driven: exact under budget, LSH-verified above. */
    case object Auto extends Route
    /** Exact plan, but throw with the estimate when over budget. */
    case object ExactOrFail extends Route
    /** Exact plan unconditionally (== [[pairs]]). */
    case object ExactAlways extends Route
    /** LSH-verified plan unconditionally. */
    case object LshAlways extends Route
  }

  /** Regime-routed containment: the capped inverted index has a
    * measured super-linear regime (flat-df corpora where the Σdf²
    * candidate term survives the per-shingle cap — the r9 rehearsal hit
    * 3.31G candidate rows / 445 s at 100k docs), so this entry point
    * ESTIMATES the candidate volume first (one cheap df aggregation)
    * and picks the plan:
    *
    *  - estimate <= `candidateBudget`: the exact inverted-index shape —
    *    identical output to [[pairs]].
    *  - above budget: MinHash-banded LSH candidates (r rows per band ->
    *    a band collides with prob J^r; b bands -> recall 1-(1-J^r)^b)
    *    VERIFIED by the exact capped-containment arithmetic over each
    *    candidate's kept shingle sets. Precision stays 1.0 (every
    *    emitted pair passes the same integer threshold over the same
    *    kept-shingle space); recall is bounded by the banding curve on
    *    the pair's JACCARD — high-asymmetry containments (tiny doc in
    *    huge doc) have low Jaccard and can be missed, which is the
    *    documented cost of leaving the quadratic regime. Band defaults
    *    (r=7, b=18) put the knee at J ~ 0.7: an equal-size
    *    0.8-containment pair has J >= 0.67 (caught at ~0.68, rising
    *    fast — J=0.75 at 0.92, J=0.86 at 0.999), while sub-knee
    *    similarity CLIQUES — the regime that forces the route here in
    *    the first place (e.g. 20k docs sharing boilerplate at
    *    J ~ 0.27) — collide at ~2e-3 per pair instead of quadratically.
    *    Looser bands would buy recall down the asymmetry curve but
    *    readmit the clique blow-up through the candidate stream.
    *
    * `onRoute` receives one line naming the chosen route + the estimate
    * (the rehearsal logs it; library users can pass their own sink).
    *
    * `route` makes the decision explicit for callers that cannot accept
    * a silent semantics change (the two routes are NOT result-identical
    * above the knee — see [[Route]]):
    *  - [[Route.Auto]] (default): estimate-driven flip, surfaced only
    *    through `onRoute`. For exploratory/pipeline use.
    *  - [[Route.ExactOrFail]]: always the exact plan; if the estimate
    *    exceeds `candidateBudget`, FAIL FAST with the estimate instead
    *    of either launching a 100×-over-budget join or silently
    *    dropping recall. The right mode for oracle-verified results.
    *  - [[Route.ExactAlways]] / [[Route.LshAlways]]: pin one plan
    *    (rehearsals, A/B measurement). */
  def pairsAuto(docs: DataFrame, shingleLen: Int = 8,
                num: Int = 4, den: Int = 5,
                maxDf: Int = Int.MaxValue,
                candidateBudget: Long = 200000000L,
                minhashBands: Int = 18, minhashRows: Int = 7,
                onRoute: String => Unit = s => System.err.println(s),
                route: Route = Route.Auto): DataFrame = {
    require(num > 0 && den >= num, "threshold num/den must be in (0, 1]")
    // exploded is NOT checkpointed: at the corpus sizes where this
    // router matters it is ~1e8 narrow rows (~3 GB) — pinning that in
    // storage starves the very aggregations downstream of execution
    // memory (measured: the df histogram's partial hash agg dies with
    // AGGREGATE_OUT_OF_MEMORY at n=1e5 on an 8 GB heap with the
    // checkpoint in, completes with it out). Recomputing the shingle
    // kernel per consumer is one extra codegen'd scan — cheap.
    val exploded = explodedShingles(docs, shingleLen)
    route match {
      case Route.ExactAlways =>
        onRoute(s"[containment] route=exact (pinned)")
        return pairsExact(exploded, num, den, maxDf)
      case Route.LshAlways =>
        onRoute(s"[containment] route=lsh (pinned) bands=$minhashBands rows_per_band=$minhashRows")
        return pairsLshVerified(docs, exploded, shingleLen, num, den, maxDf,
          minhashBands, minhashRows)
      case _ => ()
    }
    // 1-in-16 shingle-space sample: routing needs the ORDER of the
    // candidate volume, not its exact value — the flip is a COST
    // decision, but NOT a free one: above the knee the LSH route trades
    // recall on low-Jaccard/high-asymmetry containments (tiny doc
    // quoted inside a huge doc) for leaving the quadratic regime, per
    // the banding math in the scaladoc above. Precision stays 1.0 on
    // both routes; only the exact route guarantees full recall.
    val est = estimateFromExploded(exploded, maxDf, sampleMod = 16)
    if (est <= candidateBudget) {
      onRoute(s"[containment] route=exact est_candidate_rows=$est budget=$candidateBudget")
      pairsExact(exploded, num, den, maxDf)
    } else route match {
      case Route.ExactOrFail =>
        throw new IllegalStateException(
          s"[containment] exact-route candidate estimate $est exceeds budget " +
            s"$candidateBudget (sampled Σ C(df,2) over kept shingles). This call " +
            "pinned Route.ExactOrFail — rerun with Route.Auto to accept the " +
            "LSH-verified plan (full precision, banding-curve recall) or raise " +
            "candidateBudget to force the exact join at its estimated cost.")
      case _ =>
        onRoute(s"[containment] route=lsh est_candidate_rows=$est budget=$candidateBudget " +
          s"bands=$minhashBands rows_per_band=$minhashRows")
        pairsLshVerified(docs, exploded, shingleLen, num, den, maxDf,
          minhashBands, minhashRows)
    }
  }

  /** The routed scale path: banded-MinHash candidates + exact verify.
    * Candidate volume is Σ over (band, bucket) of C(bucket_size, 2) —
    * near-true-pair-count for banded 64-bit mins (random collisions are
    * ~n²/2^192 per band) instead of Σ C(df, 2) over every shared
    * shingle. */
  private def pairsLshVerified(docs: DataFrame, exploded: DataFrame,
                               shingleLen: Int, num: Int, den: Int,
                               maxDf: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    // kept shingle sets under the SAME df cap the exact plan applies —
    // the verify arithmetic is then identical, pair for pair. The cap
    // is applied as an anti-join against the HEAVY shingles (df >
    // maxDf): that set is tiny by construction (high-df boilerplate),
    // so the join broadcasts — vs joining the full ~1e8-row kept
    // histogram back onto every exploded row
    val heavy = heavyShingles(exploded, maxDf)
    // persist (MEMORY_AND_DISK), NOT localCheckpoint: keptSets carries
    // roughly the full kept-shingle payload (~GBs at the scales this
    // route engages) and feeds BOTH candidate-join sides — but a
    // pinned unrecoverable checkpoint under the verify joins' memory
    // pressure is the same squeeze the exploded-frame checkpoint
    // caused (and an EVICTED localCheckpoint block is fatal, while an
    // evicted persisted block just recomputes from lineage)
    val keptSets = exploded.join(broadcast(heavy), Seq("s"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("s")).as("sh"), count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sized = minhashCandidates(docs, shingleLen, bands, rowsPerBand)
      .join(keptSets.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
        col("n").as("a_n")), "a_id")
      .join(keptSets.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
        col("n").as("b_n")), "b_id")
      .select(col("a_id"), col("b_id"), col("a_n"), col("b_n"),
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("long").as("n_inter"))
      .filter(col("n_inter") > 0)
    // materialize the (true-pair-sized) output HERE so keptSets can be
    // released before returning — a lazy return would leak the multi-GB
    // cached frame for the session (it could never be unpersisted,
    // since the caller's first action on the frame re-reads it). If an
    // evicted output block later recomputes, lineage rebuilds keptSets
    // transiently — correct, just slower, and only on eviction.
    val out = thresholdBothDirections(sized, num, den)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    keptSets.unpersist(blocking = false)
    out
  }

  /** Exact set of shingle hashes with global df > `maxDf`, WITHOUT a
    * full ~|distinct shingles|-key aggregation (the one remaining
    * spill-heavy stage of the routed plan — a ~1e8-distinct-key
    * partial hash agg degrades to sort-fallback at single-node
    * memory). Two-phase pigeonhole (the HeavyHitters pattern on long
    * keys):
    *
    *  1. Coalesce the shingle stream to at most A=64 partitions
    *     (narrow, no shuffle), sort each partition locally with
    *     Spark's spill-aware sorter, and stream a run-length scan that
    *     emits keys with local count >= t = ceil((maxDf+1)/A).
    *     Pigeonhole: a key with global df > maxDf must reach local
    *     count t somewhere, so the union is a SUPERSET of the heavy
    *     set. (Using A even when fewer partitions exist only lowers t
    *     — still a superset.)
    *  2. Recount ONLY the candidates exactly (broadcast semi-join —
    *     the aggregation state is now |candidates|, not |distinct
    *     shingles|) and keep df > maxDf.
    *
    * Candidates are bounded by rows/t per partition; a corpus where
    * that bound actually materializes (~everything repeats exactly t
    * times per partition) would blow the broadcast, so a count guard
    * falls back to the plain full histogram — correct at any scale,
    * just with the aggregation this path exists to avoid. */
  private[operators] def heavyShingles(exploded: DataFrame, maxDf: Int): DataFrame = {
    if (maxDf == Int.MaxValue)
      return exploded.sparkSession.range(0).select(col("id").as("s"))
    val parts = 64
    // below parts partitions the pigeonhole threshold degenerates to 1
    // (= every key a candidate); the plain histogram is the honest plan
    // there — and a cap that small makes the heavy set huge anyway
    if (maxDf + 1 <= parts)
      return exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select(col("s"))
    val t = (maxDf + parts) / parts // ceil((maxDf+1)/parts) >= 2 here
    import org.apache.spark.sql.Encoders
    // sortWithinPartitions (UnsafeExternalSorter — spills to disk) then
    // a STREAMING run-length scan: per-task memory is O(1) regardless
    // of partition size. The previous shape buffered the whole
    // coalesced partition (~rows/64) into one Array[Long] before
    // sorting — unbounded as the corpus grows (1e9+ shingle rows would
    // OOM the task before the 5M candidate guard below could engage).
    val cand = exploded.select(col("s"))
      .coalesce(parts)
      .sortWithinPartitions(col("s"))
      .as[java.lang.Long](Encoders.LONG)
      .mapPartitions { it =>
        new scala.collection.AbstractIterator[java.lang.Long] {
          private var pending: java.lang.Long = null
          private var cur = 0L
          private var run = 0
          private var open = false
          private def advance(): Unit = {
            pending = null
            while (pending == null && (it.hasNext || open)) {
              if (!it.hasNext) {
                if (run >= t) pending = cur
                open = false
              } else {
                val v = it.next().longValue()
                if (!open) { cur = v; run = 1; open = true }
                else if (v == cur) run += 1
                else {
                  if (run >= t) pending = cur
                  cur = v; run = 1
                }
              }
            }
          }
          advance()
          override def hasNext: Boolean = pending != null
          override def next(): java.lang.Long = {
            val r = pending; advance(); r
          }
        }
      }(Encoders.LONG)
      .toDF("s").distinct()
      .localCheckpoint() // tiny by contract; the guard below verifies
    val nCand = cand.count()
    if (nCand > 5000000L) {
      // adversarial repeat structure — fall back to the exact histogram
      exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select(col("s"))
    } else {
      exploded.join(broadcast(cand), Seq("s"), "left_semi")
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select(col("s"))
    }
  }

  /** Banded-MinHash candidate pairs (a_id < b_id, distinct) — the
    * routed path's candidate stream, public so the rehearsal can count
    * candidates against true pairs. Permutations run over the 64-bit
    * shingle hashes via [[graft.functions.MinHashBandsU64]] (~3
    * multiplies per element-permutation), not the md5 kernel — at
    * K=126 the md5 banding alone was 60% of the routed wall at n=1e5,
    * and candidates need no oracle-parity hash family (the verify
    * stage is exact). */
  def minhashCandidates(docs: DataFrame, shingleLen: Int,
                        bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(TextFunctions.minhashBandsU64(
          TextFunctions.charShingleHashes(col("text"), shingleLen),
          bands, rowsPerBand)).as(Seq("band_idx", "band_val")))
      .localCheckpoint()
    banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }
}
