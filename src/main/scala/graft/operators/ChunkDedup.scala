package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document (chunk-level) exact deduplication — the training-pipeline
  * pass that removes repeated paragraphs/boilerplate ACROSS documents
  * without dropping whole docs (doc-level dedup is `Dedup`/`d_neardup_*`;
  * this operates one level down, the reference has no analog — it's part
  * of the LLM-data surface this engine adds).
  *
  * Chunking is fixed-width word windows (the corpus is whitespace-token
  * text): `words[i*w, (i+1)*w)` re-joined with single spaces. Chunk
  * identity is the exact chunk string, so the DuckDB oracle can run the
  * identical computation (string_split + positional group-concat).
  *
  * Scale shape: the explode is per CHUNK (corpus words / w rows, not per
  * word), duplicate detection is one hash aggregate over high-cardinality
  * keys (single distinct agg -> Spark's two-stage rewrite, no Expand),
  * and survivor selection is a window partitioned BY CHUNK — millions of
  * tiny partitions, the skew-free direction (contrast a per-doc window).
  * Nothing here is driver-side; all stages shuffle on content-hash keys
  * that stay balanced no matter the corpus size.
  */
object ChunkDedup {

  /** Array of w-word chunk strings from a text column — pure Catalyst
    * (split/sequence/transform/slice/concat_ws), codegen-friendly, no
    * UDF. The trailing chunk keeps its natural (shorter) width. */
  def chunksOf(text: Column, w: Int): Column = {
    val words = split(text, " ")
    // ceil(size/w) in int arithmetic; split("") = [""] so size >= 1 and
    // the sequence bound is always >= 0
    val nChunks = (size(words) + lit(w - 1)).divide(lit(w)).cast("int")
    transform(sequence(lit(0), nChunks - lit(1)),
      i => concat_ws(" ", slice(words, i * lit(w) + lit(1), lit(w))))
  }

  /** One row per (doc, chunk occurrence): (doc_id, chunk_no, chunk).
    * Null text is filtered (matching the oracle, whose unnest emits no
    * rows for it) — without the filter, size(null) = -1 makes
    * sequence(0, -1) step backwards to [0, -1] and a null-text doc
    * would fabricate two phantom empty chunks on the Spark side only. */
  def occurrences(docs: DataFrame, w: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(chunksOf(col("text"), w)).as(Seq("chunk_no", "chunk")))
      .withColumn("chunk_no", col("chunk_no").cast("long"))

  /** Cross-document duplicated chunks: md5 fingerprint, how many docs and
    * occurrences share the chunk, and the first (lowest-id) doc carrying
    * it. Detection only — the filter pass is [[dedupStats]]. */
  def dupChunks(docs: DataFrame, w: Int): DataFrame =
    occurrences(docs, w)
      .groupBy(md5(col("chunk").cast("binary")).as("chunk_hash"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)

  /** Keep-first chunk dedup, reported per document: global occurrence
    * order is (doc_id, chunk_no); the first occurrence of every distinct
    * chunk survives, later ones (cross-doc AND in-doc repeats) drop.
    * Output: (doc_id, n_chunks, n_dropped, chars_kept). */
  def dedupStats(docs: DataFrame, w: Int): DataFrame = {
    val rn = row_number().over(
      Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("chunk_no")))
    occurrences(docs, w)
      .withColumn("rn", rn)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rn") === 1, length(col("chunk")).cast("long"))
          .otherwise(0L)).as("chars_kept"))
  }
}
