package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level duplication: the maximal token spans of each
  * document that also occur verbatim in ANOTHER document — the
  * fine-grained dedup pass of an LLM-data pipeline (boilerplate headers,
  * license blocks, syndicated paragraphs), one level below document/chunk
  * dedup: it localizes WHICH region of a kept document is duplicated
  * text, so a curation pass can excise spans instead of dropping docs.
  *
  * Method (the anchor-and-merge shape, scale-first):
  *  1. every position i of every document emits the 64-bit hash of its
  *     L-token window ("anchor") — O(total tokens) rows of
  *     (hash, doc, pos), hashes not strings, so the shuffle carries
  *     8-byte keys (the d_source_overlap lesson);
  *  2. an anchor hash occurring in >= 2 DISTINCT documents marks every
  *     one of its windows duplicated. Distinctness is tested with
  *     min(doc) != max(doc) — one ordinary aggregation, no
  *     count-distinct expansion;
  *  3. per document, hit positions merge into maximal spans by
  *     gaps-and-islands (pos - row_number is constant within a run of
  *     consecutive positions); a run of anchors starting at positions
  *     [s, e] covers tokens [s, e + L - 1].
  *
  * Every window in a duplicated region of length >= L is itself
  * duplicated, so consecutive-anchor islands recover the full maximal
  * span exactly — no heuristics. Cost: one token-scan, one 8-byte-key
  * shuffle with map-side partial aggregation, one per-document window
  * (bounded by the document's own length). Nothing is quadratic in the
  * corpus and no driver state exists, so the plan survives 100 TB; the
  * window length L is the only knob (short L = more sensitivity, more
  * anchor rows).
  *
  * A 64-bit collision could mark one window in ~2^32-window corpora
  * spuriously (birthday bound); acceptable for curation and mirrored by
  * the string-keyed oracle, which is collision-free — the driver's
  * hash-equality check is therefore also a collision audit at test scale.
  */
object SubstringDedup {

  /** Maximal cross-document duplicated spans.
    *
    * @param docs      (idCol, textCol) — whitespace-tokenized corpus
    * @param minTokens L, the minimum duplicated-run length in tokens
    * @return (doc_id, span_start, span_end, span_len) — 1-based token
    *         positions, inclusive; span_len = span_end - span_start + 1
    *         >= minTokens
    */
  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                      minTokens: Int): DataFrame = {
    require(minTokens > 0, s"minTokens must be positive, got $minTokens")
    val anchors = docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= minTokens)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(toks) - $minTokens + 1)," +
          s" i -> xxhash64(concat_ws(' ', slice(toks, i, $minTokens))))"))
        .as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))

    // anchor hashes seen in >= 2 distinct documents (min != max — no
    // count-distinct). Positions within one doc are distinct by
    // construction, so no pre-dedup is needed.
    val dupHashes = anchors
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("h"))

    val hits = anchors.join(dupHashes, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"))

    // gaps-and-islands: consecutive positions share (pos - row_number)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(minTokens - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long").as("span_len"))
  }
}
