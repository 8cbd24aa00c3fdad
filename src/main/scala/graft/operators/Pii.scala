package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the privacy-filter
  * pass a training-data pipeline runs before release.
  *
  * Everything here is per-row codegen'd expression work (regexp scan +
  * replace): no shuffle, no state, so the same operator serves batch
  * frames and Structured Streams unchanged (PiiSpec runs both). At
  * 100 TB the scan parallelizes embarrassingly and the filter pushes
  * nothing — every byte of text must be inspected once, which is the
  * floor for this operation.
  *
  * Patterns are deliberately restricted to the regex subset where
  * Java's engine (Spark) and RE2 (DuckDB, used as the catalog oracle)
  * provably agree — ASCII classes, greedy quantifiers, `\b` word
  * boundaries — so the t_pii_redact catalog row hash-compares the full
  * redacted text across engines, not just match counts. Extend
  * [[Rules]] with the same discipline.
  */
object Pii {

  /** One detectable/redactable PII category. */
  final case class Rule(name: String, regex: String, placeholder: String)

  /** The default rule set, in REDACTION ORDER (earlier rules consume
    * their text before later patterns see it — emails first so an
    * address is never half-eaten by a broader pattern). */
  val Rules: Seq[Rule] = Seq(
    Rule("email", graft.queries.Text.EmailRegex, "<EMAIL>"),
    Rule("phone", graft.queries.Text.PhoneRegex, "<PHONE>"),
    Rule("ip", graft.queries.Text.Ipv4Regex, "<IP>"))

  /** Per-rule match count columns, named `n_<rule>`. lit()-passed
    * patterns, never SQL-literal-interpolated: a Spark SQL string
    * literal would eat `\b` as an escape. */
  def countCols(text: Column, rules: Seq[Rule] = Rules): Seq[Column] =
    rules.map(r =>
      size(regexp_extract_all(text, lit(r.regex), lit(0)))
        .cast("long").as(s"n_${r.name}"))

  /** The redacted text: rules applied in order, each replacing every
    * match with its placeholder. */
  def redactCol(text: Column, rules: Seq[Rule] = Rules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.regex, r.placeholder))

  /** Scan: the input frame plus one `n_<rule>` count column per rule —
    * the audit/report shape (how much PII does this corpus carry?). */
  def scan(df: DataFrame, textCol: String, rules: Seq[Rule] = Rules): DataFrame =
    df.select(df.columns.map(col).toIndexedSeq ++ countCols(col(textCol), rules): _*)

  /** Redact: the input frame with `textCol` replaced by its redacted
    * form — the release-gate shape. Schema is otherwise unchanged. */
  def redact(df: DataFrame, textCol: String, rules: Seq[Rule] = Rules): DataFrame =
    df.withColumn(textCol, redactCol(col(textCol), rules))
}
