package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (quality scoring, token counting,
  * fingerprinting, exact/near dedup precursors). Everything here is a
  * single scan + bounded shuffle; shingle explosion multiplies rows by
  * O(doc_len) but stays partition-local until the per-doc re-aggregation.
  */
object Text {
  private def t(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** Stopword list used by the profile + quality score (kept tiny and
    * explicit so the SQL oracle states the same set). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Corpus profile by language.
    "t_lang_stats" -> ((s, dir) => {
      t(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"))
    }),

    // Token counting: whitespace tokens via the subtraction identity
    // (exactly mirrored in SQL; robust to engine split() differences).
    "t_token_counts" -> ((s, dir) => {
      t(s, dir)
        .withColumn("n_tokens",
          length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit(""))) + 1)
        .select(col("doc_id"), col("n_chars"), col("n_tokens").cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprint: min-hash over 8-char shingles (1-permutation
    // MinHash), computed per-row with higher-order functions — zero
    // explode, zero extra shuffle rows, stays in whole-stage codegen.
    "t_fingerprint" -> ((s, dir) => {
      t(s, dir)
        .select(col("doc_id"),
          expr("array_min(transform(sequence(1, greatest(length(text) - 7, 1))," +
            " i -> md5(substring(text, i, 8))))").as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Exact near-dup precursor: documents sharing a 50-char prefix
    // fingerprint (hash-groupBy dedup; the exact-dedup operator shape).
    "t_prefix_dup_groups" -> ((s, dir) => {
      t(s, dir)
        .withColumn("h", md5(substring(col("text"), 1, 50)))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_doc"),
          max(col("doc_id")).as("last_doc"))
        .filter(col("n") > 1)
        .orderBy(col("h"))
    }),

    // Stopword profile: per-row higher-order functions (size/filter over
    // split) — no token explode, no shuffle of O(total_tokens) rows; the
    // whole query is a single codegen'd scan + final sort.
    "t_stopword_profile" -> ((s, dir) => {
      val stop = Stopwords.map(w => s"'$w'").mkString("(", ",", ")")
      t(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          expr(s"size(filter(split(text, ' '), tok -> tok IN $stop))")
            .cast("long").as("n_stop"))
        .orderBy(col("doc_id"))
    }),

    // Quality score: deterministic scalar double math over integer counts
    // (stopword ratio + length normalization), the heuristic-filter shape
    // of LLM data pipelines. Per-row expressions only — no explode.
    "t_quality_score" -> ((s, dir) => {
      val stop = Stopwords.map(w => s"'$w'").mkString("(", ",", ")")
      t(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          expr(s"size(filter(split(text, ' '), tok -> tok IN $stop))")
            .cast("long").as("n_stop"))
        .withColumn("stop_ratio", col("n_stop") / col("n_tok"))
        .withColumn("len_norm", least(lit(1.0), col("n_chars") / lit(500.0)))
        .withColumn("quality", col("stop_ratio") * 0.5 + col("len_norm") * 0.5)
        .select(col("doc_id"), col("n_tok"), col("n_stop"), col("stop_ratio"),
          col("len_norm"), col("quality"))
        .orderBy(col("doc_id"))
    })
  )

  private val stopSql = Stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  val oracles: Map[String, String] = Map(
    "t_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "t_token_counts" ->
      """SELECT doc_id, n_chars,
        | CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_fingerprint" ->
      """SELECT doc_id,
        | list_aggregate(list_transform(generate_series(1, greatest(length(text) - 7, 1)),
        |   i -> md5(substring(text, i, 8))), 'min') AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_prefix_dup_groups" ->
      """SELECT md5(substring(text, 1, 50)) AS h, count(*) AS n,
        | min(doc_id) AS keep_doc, max(doc_id) AS last_doc
        |FROM documents
        |GROUP BY 1 HAVING count(*) > 1
        |ORDER BY h""".stripMargin,

    "t_stopword_profile" ->
      s"""SELECT doc_id, count(*) AS n_tok,
         | CAST(sum(CASE WHEN tok IN $stopSql THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) x
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t_quality_score" ->
      s"""SELECT doc_id, n_tok, n_stop,
         | n_stop / n_tok AS stop_ratio,
         | least(1.0, n_chars / 500.0) AS len_norm,
         | (n_stop / n_tok) * 0.5 + least(1.0, n_chars / 500.0) * 0.5 AS quality
         |FROM (
         |  SELECT doc_id, n_chars, count(*) AS n_tok,
         |   CAST(sum(CASE WHEN tok IN $stopSql THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
         |  FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS tok FROM documents) x
         |  GROUP BY doc_id, n_chars) y
         |ORDER BY doc_id""".stripMargin
  )
}
