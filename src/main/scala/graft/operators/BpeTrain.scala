package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — learning
  * the merge table from the corpus itself, the step upstream of every
  * "count tokens" operation in an LLM pipeline.
  *
  * Algorithm (Sennrich et al. 2016, word-internal BPE): start from
  * whitespace words split into character symbols; each round, count
  * adjacent symbol pairs corpus-wide, merge the most frequent pair
  * everywhere, repeat. Ties break deterministically (max count, then
  * lexicographically smallest pair) so the learned vocabulary is
  * reproducible run-over-run and engine-over-engine.
  *
  * Scale shape: the corpus state is a Dataset of per-word symbol
  * arrays, partitioned across executors and NEVER collected. One round
  * = one map-side pair explode + a partial-aggregated count shuffle of
  * O(distinct pairs) rows + a 1-row argmax collect + one narrow map
  * applying the merge. Words are deduplicated up front with
  * multiplicities (classic BPE trick): pair counts weight by word
  * frequency, so the per-round work is O(distinct words), not
  * O(corpus) — at 100 TB the distinct-word table is orders of
  * magnitude smaller than the corpus and the rounds never touch the
  * raw text again. Lineage is truncated with an eager localCheckpoint
  * per round so round k starts from materialized blocks, never a
  * k-deep map chain.
  *
  * The merge APPLY step is an executor-local imperative kernel (the
  * HNSW-kernel precedent: genuinely sequential per-row work), one
  * left-to-right greedy pass per word — O(len) per round, allocation-
  * light, no quadratic array rebuilding inside Catalyst aggregates.
  */
object BpeTrain {

  /** One learned merge: rank = merge order (0-based). */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Split a word into CODE POINT symbols — never UTF-16 code units: a
    * lone surrogate from a split non-BMP char (emoji, CJK-ext) would be
    * corrupted to '?' by the UTF-8 round-trip through Spark's
    * UTF8String, silently merging counts of every non-BMP character. */
  private[operators] def codePointSymbols(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Greedy left-to-right application of one merge to a symbol array —
    * non-overlapping, leftmost-first (the standard BPE apply). The
    * overwhelmingly common case as training proceeds is "pair absent":
    * a scan-first pass keeps it allocation-free. */
  private[operators] def applyMerge(
      syms: Array[String], left: String, right: String): Array[String] = {
    val n = syms.length
    if (n < 2) return syms
    var first = -1
    var s = 0
    while (first < 0 && s < n - 1) {
      if (syms(s) == left && syms(s + 1) == right) first = s
      s += 1
    }
    if (first < 0) return syms
    val out = new Array[String](n)
    System.arraycopy(syms, 0, out, 0, first)
    var i = first
    var o = first
    while (i < n) {
      if (i + 1 < n && syms(i) == left && syms(i + 1) == right) {
        out(o) = left + right
        i += 2
      } else {
        out(o) = syms(i)
        i += 1
      }
      o += 1
    }
    java.util.Arrays.copyOfRange(out, 0, o)
  }

  /** Learn `nMerges` merges from `docs(textCol)`. Whitespace-word BPE:
    * merges never cross word boundaries. Returns merges in rank order. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._

    // distinct words with multiplicity; then code-point-split once.
    // localCheckpoint (not persist): a persisted Dataset still CHAINS
    // its logical plan, so k rounds of .map would nest k plans deep
    // (O(k) analysis per round, driver stack overflow at real vocab
    // sizes) and a lost cached partition would replay every round from
    // the raw words. localCheckpoint truncates the plan to the
    // materialized blocks; superseded rounds are freed by the
    // ContextCleaner when their reference drops — including when a
    // mid-training failure unwinds the loop. (Known trade-off, already
    // recorded in BASELINE.md: localCheckpoint blocks are evictable
    // under memory pressure; a production-scale run with tens of
    // thousands of merges wants reliable checkpoint() against a
    // checkpoint dir instead.)
    var state = docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (codePointSymbols(w), n) }
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // corpus-wide weighted pair counts; argmax with the deterministic
      // (count desc, left asc, right asc) tie-break — a 1-row collect
      val top = state
        .flatMap { case (syms, n) =>
          if (syms.length < 2) Iterator.empty
          else (0 until syms.length - 1).iterator
            .map(i => ((syms(i), syms(i + 1)), n))
        }
        .toDF("pair", "n")
        .groupBy(col("pair")).agg(sum(col("n")).as("freq"))
        .orderBy(col("freq").desc, col("pair._1"), col("pair._2"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val row = top(0)
        val pair = row.getStruct(0)
        val (left, right, freq) =
          (pair.getString(0), pair.getString(1), row.getLong(1))
        merges += Merge(rank, left, right, freq)
        // apply everywhere; eager localCheckpoint truncates the plan so
        // round k+1 starts from materialized blocks, not a k-deep map
        // chain (see the head-of-loop comment)
        state = state
          .map { case (syms, n) => (applyMerge(syms, left, right), n) }
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** The merge table as a DataFrame (rank, left, right, freq) — the
    * catalog/serving shape. */
  def mergesDF(spark: SparkSession, docs: DataFrame, textCol: String,
               nMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, nMerges)
      .map(m => (m.rank.toLong, m.left, m.right, m.freq))
      .toDF("rank", "left", "right", "freq")
  }

  /** Tokenize with a learned merge table: merges applied in rank order
    * per word (how the trained vocab is USED downstream). */
  def encodeWord(word: String, merges: Seq[Merge]): Array[String] = {
    var syms = codePointSymbols(word)
    merges.foreach(m => syms = applyMerge(syms, m.left, m.right))
    syms
  }
}
