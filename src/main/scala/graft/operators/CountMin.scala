package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
  * object: the sketch is a DataFrame of at most `depth * width` cells
  * `(r, c, n)`, built by one hash aggregation and merged by union +
  * re-aggregation. This is deliberately not a custom UDAF buffer — the
  * bounded-cardinality groupBy IS the sketch update, and Spark's partial
  * aggregation IS the sketch merge: every scan partition collapses to
  * <= depth*width cells map-side, so the shuffle moves O(depth*width)
  * rows per partition regardless of corpus size. At 100 TB that is the
  * whole point: approximate frequencies for EVERY key with a fixed-size
  * state, where the exact plan must shuffle one row per distinct key
  * (billions). The exact counterpart in this catalog is
  * [[HeavyHitters]] (Misra-Gries + exact verify) — CMS answers point
  * queries over the full key universe instead of just the top-k.
  *
  * Guarantees (the textbook ones, spec-pinned in CountMinSpec):
  *  - One-sided: estimate(x) >= true_count(x) ALWAYS (collisions only
  *    add). A violation anywhere is a bug, not noise.
  *  - With width w and depth d, P[estimate(x) > true(x) + (e/w)·N]
  *    <= exp(-d), N = total item count — the classic ε = e/w, δ = e^-d
  *    parameterization.
  *
  * Hashing: the d row hashes are `xxhash64(item, seed, r)` mod w —
  * Spark's codegen'd 64-bit hash with the row index mixed in as an
  * argument, so the d functions are independent draws of the same
  * family and the whole build stays inside whole-stage codegen.
  */
object CountMin {

  final case class Config(depth: Int = 4, width: Int = 1 << 14, seed: Long = 42L) {
    require(depth >= 1 && width >= 2, "depth >= 1, width >= 2")
  }

  private def cellOf(item: org.apache.spark.sql.Column,
                     r: org.apache.spark.sql.Column, cfg: Config) =
    pmod(xxhash64(item, lit(cfg.seed), r), lit(cfg.width.toLong))

  /** Build the sketch over `items(itemCol)` (one count per ROW — pass a
    * pre-exploded token stream, not documents). Output: `(r, c, n)` with
    * r in [0, depth), c in [0, width), missing cells meaning 0. */
  def sketch(items: DataFrame, itemCol: String, cfg: Config = Config()): DataFrame = {
    val rIdx = explode(array((0 until cfg.depth).map(i => lit(i)): _*)).as("r")
    items
      .filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("__i"), rIdx)
      .select(col("r"), cellOf(col("__i"), col("r"), cfg).as("c"))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge sketches built with the SAME config: cell-wise sum. Partial
    * sketches from disjoint corpus slices merge to exactly the sketch of
    * the union (spec-pinned) — the pre-aggregation pattern: keep per-day
    * sketches, answer any date range by merging. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("c"))
      .agg(sum(col("n")).as("n"))

  /** Point estimates for the distinct items of `queries(itemCol)`:
    * min over the d probed cells (absent cell = 0). The sketch is at
    * most depth*width rows — broadcast, so the probe side never
    * shuffles beyond its own distinct(). */
  def estimate(sketchDf: DataFrame, queries: DataFrame, itemCol: String,
               cfg: Config = Config()): DataFrame = {
    val rIdx = explode(array((0 until cfg.depth).map(i => lit(i)): _*)).as("r")
    queries
      .filter(col(itemCol).isNotNull)
      .select(col(itemCol)).distinct()
      .select(col(itemCol), rIdx)
      .withColumn("c", cellOf(col(itemCol), col("r"), cfg))
      .join(broadcast(sketchDf), Seq("r", "c"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
