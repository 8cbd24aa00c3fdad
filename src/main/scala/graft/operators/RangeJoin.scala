package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval/band) join — points matched to the intervals that
  * contain them. Spark plans a bare `start <= p AND p <= end` condition
  * as a nested-loop join: O(|points| · |intervals|) comparisons, the
  * classic accidental cross product. The scalable form CHUNKS the value
  * axis: every interval replicates to the fixed-width chunks it covers,
  * every point hashes to its single chunk, and the match becomes an
  * equi-join on chunk (plus any equi keys) with the exact band
  * condition as a post-filter. Cost: O(|points| + |intervals| ·
  * span/chunkWidth) shuffled rows — chunkWidth tunes replication
  * against per-chunk fan-in, and a point living in exactly one chunk
  * means no dedup pass is needed.
  *
  * Interval semantics are CLOSED ([start, end], mirroring SQL BETWEEN).
  * Columns of the two inputs must be disjoint.
  */
object RangeJoin {

  /** @param keys extra equi-join columns: Seq of (pointCol, intervalCol)
    *             pairs — a band join with a key shuffles on (key, chunk).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      chunkWidth: Long, keys: Seq[(String, String)] = Nil): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    val chunked = intervals
      .withColumn("__chunk", explode(sequence(
        floor(col(startCol) / chunkWidth).cast("long"),
        floor(col(endCol) / chunkWidth).cast("long"))))
    val pts = points
      .withColumn("__chunk", floor(col(pointCol) / chunkWidth).cast("long"))
    val cond = keys.foldLeft(
        pts("__chunk") === chunked("__chunk") &&
          pts(pointCol) >= chunked(startCol) &&
          pts(pointCol) <= chunked(endCol)) {
      case (c, (pk, ik)) => c && pts(pk) === chunked(ik)
    }
    pts.join(chunked, cond)
      .select(points.columns.map(pts(_)) ++
        intervals.columns.map(chunked(_)): _*)
  }
}
