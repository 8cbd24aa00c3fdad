package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** Streaming twin of `s_pack_sequences` (fixed-length training-sequence
  * packing): micro-batches of docs arrive in pack order, each batch is
  * packed against the RUNNING global token offset, and per-sequence
  * partial stats fold into an accumulator keyed by seq_id. The fold is
  * exact — a sequence straddling a batch boundary is two partials whose
  * (sum, sum, min, max) merge equals the batch computation — so the
  * folded state is row-identical to packing everything seen at once
  * (spec-pinned at any firehose split). State is one long (the carry
  * offset) plus one row per OPEN-or-emitted sequence; the token stream
  * itself is never retained, the 100 TB posture for continuous packing.
  */
object StreamingPack {

  /** Pack one micro-batch starting at global token offset `carry`.
    * Returns the per-sequence partial stats and the new carry.
    * `batch` must be (doc_id, n_tok) with docs in pack order (doc_id).
    *
    * Zero-token docs are dropped up front: they contribute nothing to
    * any sequence, and Spark's `sequence(a, b)` with b < a (which
    * fin == start produces whenever start lands on a multiple of L)
    * generates a DESCENDING pair, not an empty array — a phantom
    * two-sequence membership for an empty doc. */
  def packBatch(batch: DataFrame, L: Int, carry: Long,
                numPartitions: Int = 32): (DataFrame, Long) = {
    val r = PrefixSum.ranged(batch.filter(col("n_tok") >= 1), numPartitions,
      order = Seq(col("doc_id")), weight = col("n_tok"))
    val prev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val part = r.df
      .withColumn("start",
        lit(carry) + r.offset + coalesce(sum(col("n_tok")).over(prev), lit(0L)))
      .withColumn("fin", col("start") + col("n_tok"))
      .select(col("doc_id"), col("start"), col("fin"),
        explode(sequence(expr(s"start div $L"), expr(s"(fin - 1) div $L")))
          .as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("fin"), (col("seq_id") + 1) * L) -
          greatest(col("start"), col("seq_id") * L)).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
    (part, carry + r.total)
  }

  /** Fold per-batch partials: stats of a straddling sequence merge
    * exactly (counts and fills add, doc spans union). */
  def merge(acc: DataFrame, part: DataFrame): DataFrame =
    acc.unionByName(part)
      .groupBy(col("seq_id"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))
}
