package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the enrichment shape of an event pipeline (click
  * attribution, request/response stitching) as a watermarked interval
  * join.
  *
  * Both sides are watermarked, and the join condition bounds the match
  * window ([leftTs, leftTs + maxDelay]), which is what lets the engine
  * BOUND THE STATE: each side buffers only rows younger than
  * watermark + window, so state is O(arrival rate x window), independent
  * of stream length — the property that makes the join runnable forever.
  * An unbounded-condition stream-stream join would grow state without
  * limit; Spark rejects it in append mode for exactly that reason.
  *
  * The same call works for batch frames (watermarks are no-ops there),
  * which is how the spec proves batch/stream equality on the union of
  * all micro-batches.
  */
object StreamingJoins {

  /** Inner interval join: rows of `right` matched to rows of `left` with
    * equal keys and rightTs in [leftTs, leftTs + maxDelay]. Column names
    * must be disjoint across the two sides (the usual stream-enrichment
    * layout: (imp_id, user_id, imp_ts) x (click_id, click_user, click_ts)). */
  def intervalJoin(left: DataFrame, leftKey: String, leftTs: String,
                   right: DataFrame, rightKey: String, rightTs: String,
                   maxDelay: String, watermark: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"interval $maxDelay"))
}
