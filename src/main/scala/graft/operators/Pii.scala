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

  /** Counts and redaction built in ONE stage-wise fold: each rule
    * counts its matches on the text as redacted by the EARLIER rules,
    * then redacts them — so `n_<rule>` always equals the number of
    * `<RULE>` placeholders in the final text, even when categories
    * overlap (e.g. a phone number embedded in an email address is the
    * email rule's redaction, and counts as such — raw-text counting
    * would report a phone the redacted output doesn't show). */
  private def stages(text: Column, rules: Seq[Rule]): (Seq[Column], Column) =
    rules.foldLeft((Seq.empty[Column], text)) { case ((counts, t), r) =>
      // lit()-passed patterns, never SQL-literal-interpolated: a Spark
      // SQL string literal would eat `\b` as an escape
      (counts :+ size(regexp_extract_all(t, lit(r.regex), lit(0)))
          .cast("long").as(s"n_${r.name}"),
        regexp_replace(t, r.regex, r.placeholder))
    }

  /** Per-rule redaction-count columns, named `n_<rule>` (stage-wise
    * semantics — see [[stages]]). */
  def countCols(text: Column, rules: Seq[Rule] = Rules): Seq[Column] =
    stages(text, rules)._1

  /** The redacted text: rules applied in order, each replacing every
    * match with its placeholder. */
  def redactCol(text: Column, rules: Seq[Rule] = Rules): Column =
    stages(text, rules)._2

  /** Backtick-quoted column access: a name containing dots must stay
    * ONE top-level column, not parse as struct navigation (the ingest
    * readers' dotted-field lesson). Embedded backticks double. */
  private def qcol(name: String): Column =
    col(s"`${name.replace("`", "``")}`")

  /** Scan: the input frame plus one `n_<rule>` count column per rule —
    * the audit/report shape (how much PII does this corpus carry?). */
  def scan(df: DataFrame, textCol: String, rules: Seq[Rule] = Rules): DataFrame =
    df.select(df.columns.map(qcol).toIndexedSeq ++ countCols(qcol(textCol), rules): _*)

  /** Redact: the input frame with `textCol` replaced by its redacted
    * form — the release-gate shape. Schema is otherwise unchanged. */
  def redact(df: DataFrame, textCol: String, rules: Seq[Rule] = Rules): DataFrame =
    df.withColumn(textCol, redactCol(qcol(textCol), rules))
}
