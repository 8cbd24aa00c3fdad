package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters (top-N most frequent tokens) via a
  * two-pass sketch-then-verify plan — the shape that survives 100 TB where
  * a naive `groupBy(token)` shuffles one row per DISTINCT token per
  * partition (at web scale: billions of distinct tokens, dominated by the
  * long tail that can never be in the top N).
  *
  * Pass 1 runs a Misra-Gries summary of capacity `c` inside each input
  * partition (`mapPartitions`, zero shuffle). MG guarantees every token
  * whose count within the partition exceeds n_p/(c+1) survives the
  * partition's sketch; summing the contrapositive across partitions, the
  * union of all partition sketches is a SUPERSET of every token with
  * global count > n/(c+1). The candidate set is therefore at most
  * #partitions x c rows — broadcastable by construction.
  *
  * Pass 2 re-scans, keeps only candidate tokens (broadcast semi-join — the
  * explode is a narrow codegen op; the shuffle after it carries only
  * candidate hits, pre-reduced by partial aggregation), and counts them
  * EXACTLY. The final top-N is provably exact whenever the Nth count
  * clears the n/(c+1) sketch floor; if it doesn't (adversarially flat
  * distributions), we fall back to the full groupBy — correct at any
  * scale, just without the shuffle reduction.
  *
  * The reference has no frequency operator; this extends the pipeline
  * surface (quality filtering and vocabulary analysis both need it).
  * Tie-breaks are deterministic: (count DESC, token ASC).
  */
object HeavyHitters {

  /** Per-partition Misra-Gries candidate tokens (whitespace tokenization,
    * matching the t_* query family and the DuckDB `string_split` oracle). */
  def candidateTokens(docs: DataFrame, textCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"sketch capacity must be positive, got $capacity")
    val texts = docs.filter(col(textCol).isNotNull)
      .select(col(textCol)).as[String](Encoders.STRING)
    val cands = texts.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](capacity * 2)
      it.foreach { text =>
        val toks = text.split(" ", -1)
        var i = 0
        while (i < toks.length) {
          val tok = toks(i)
          // stored counts are always >= 1, so boxed-null (absent) unboxes
          // to 0 and cleanly means "not tracked"
          val cur = counters.get(tok)
          if (cur != 0L) {
            counters.put(tok, cur + 1L)
          } else if (counters.size < capacity) {
            counters.put(tok, 1L)
          } else {
            // decrement-all step: one shared "charge" against every
            // counter; amortized O(1) per token over the stream
            val jt = counters.entrySet().iterator()
            while (jt.hasNext) {
              val e = jt.next()
              if (e.getValue <= 1L) jt.remove() else e.setValue(e.getValue - 1L)
            }
          }
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().iterator().asScala
    }(Encoders.STRING)
    cands.toDF("tok").distinct()
  }

  /** Exact top-N tokens by frequency. Returns (tok, cnt, rank) ordered by
    * (cnt DESC, tok ASC); exactness is guaranteed by the sketch floor or,
    * failing that, by the full-aggregation fallback. */
  def topTokens(docs: DataFrame, textCol: String, topN: Int, capacity: Int): DataFrame = {
    val tokens = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("tok"))
    val totalTokens = docs.filter(col(textCol).isNotNull)
      .select(sum(size(split(col(textCol), " "))).cast("long"))
      .collect()(0) match { case r if r.isNullAt(0) => 0L; case r => r.getLong(0) }

    // top-N via orderBy+limit+collect (TakeOrderedAndProject: per-
    // partition top-N, driver merge — the scale-safe reduction), NEVER a
    // partition-less row_number window: in the fallback the window's
    // single-partition sort over every distinct token is the exact
    // long-tail bottleneck this operator exists to avoid. Ranks are then
    // pure arithmetic over the <= topN collected rows — no WindowExec at
    // all (a lit-partitioned window doesn't survive constant folding and
    // still logs the single-partition degradation warning).
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tok",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false)))
    def rankedTopN(counts: DataFrame): Array[org.apache.spark.sql.Row] =
      counts.orderBy(col("cnt").desc, col("tok")).limit(topN).collect()
        .sortBy(r => (-r.getLong(1), r.getString(0)))
        .zipWithIndex
        .map { case (r, i) =>
          org.apache.spark.sql.Row(r.getString(0), r.getLong(1), i + 1L)
        }
    def asDF(rows: Array[org.apache.spark.sql.Row]): DataFrame = {
      import scala.jdk.CollectionConverters._
      docs.sparkSession.createDataFrame(rows.toSeq.asJava, outSchema)
    }

    val cands = candidateTokens(docs, textCol, capacity)
    val got = rankedTopN(
      tokens.join(broadcast(cands), Seq("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt")))
    val floor = totalTokens / (capacity.toLong + 1L)
    // exact iff the candidate-only top-N is full AND its smallest count
    // clears the sketch floor — every non-candidate token has true count
    // <= floor, so none can displace a row (ties broken by token can't
    // strike either: a tied non-candidate would need cnt = last.cnt >
    // floor, contradiction)
    val guaranteed = got.length == topN && got.last.getLong(1) > floor
    if (guaranteed || totalTokens == 0L) {
      // return the already-computed rows — re-materializing the lazy
      // plan would run the whole MG + join + agg pipeline a second time
      asDF(got)
    } else {
      // sketch floor not cleared (flat distribution or fewer distinct
      // tokens than N) — fall back to the always-correct full aggregation
      asDF(rankedTopN(tokens.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))))
    }
  }
}
