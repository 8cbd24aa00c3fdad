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
    val exploded = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFunctions.charShingleHashes(col("text"), shingleLen)).as("s"))
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
    // both directions from ONE pass: a union of two filters re-plans the
    // whole inverted-index subtree per branch (the explode would run
    // twice per side); exploding each sized row into its two candidate
    // directions keeps a single subtree + one trivial Generate
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
  }
}
