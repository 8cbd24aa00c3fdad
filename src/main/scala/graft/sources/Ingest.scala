package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** Text-format ingestion for raw corpora — the formats 100 TB of
  * training data actually arrives in (JSONL shards, CSV dumps) before
  * it becomes parquet. Design rules for scale:
  *
  *  - **Schema is always EXPLICIT.** Inference (`spark.read.json` with
  *    no schema) scans the whole input once just to guess types — at
  *    corpus scale that doubles the read, and a schema drifting with
  *    the data is how silent column corruption ships. Callers pass the
  *    `StructType`; the reader only adds the corrupt-record column.
  *  - **A poisoned line must not kill the scan** (the media-decode
  *    contract, applied to text): the good-row readers drop malformed
  *    lines, and the paired quarantine scans ([[jsonlQuarantine]],
  *    [[csvQuarantine]]) recover each rejected line's raw text for
  *    accounting and repair — at ingest scale "how many lines failed
  *    and why" is a product metric, not noise.
  *  - **JSONL stays splittable.** One JSON document per line is the
  *    only JSON layout a distributed reader can split on byte ranges;
  *    multiLine JSON serializes a whole file into one task. The writer
  *    emits exactly this layout via the codegen'd `to_json`.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType, nullable = true))

  /** Backtick-quoted field access into the parsed struct: a field named
    * `user.id` (common in flattened telemetry JSON) must navigate ONE
    * struct level, not parse as dotted navigation (the AsofJoin
    * dotted-name lesson). Embedded backticks double per SQL quoting. */
  private def pField(f: String): Column =
    col(s"__p.`${f.replace("`", "``")}`")

  // Good rows and quarantine are BOTH built from one text scan + an
  // explicit from_json/from_csv parse, never from the file-source
  // readers' mode options:
  //  - a PERMISSIVE file read can't be split afterwards (Spark
  //    disallows querying only the corrupt-record column off a raw
  //    scan, and the documented cache() workaround pins the corpus —
  //    a non-starter at 100 TB);
  //  - DROPMALFORMED's semantics are PROJECTION-DEPENDENT: CSV column
  //    pruning means `count()` parses nothing and counts malformed
  //    rows as good (measured: a type-broken line survives count()
  //    but not a field projection).
  // The text scan stays splittable and pushes down; the parse is one
  // catalyst expression evaluated identically on both sides, so
  // good + quarantine (+ the structurally skipped blank/header lines)
  // partitions the input EXACTLY, under any projection — IngestSpec
  // asserts the counts.

  /** Attach the parse column to a lines frame (batch or streaming —
    * ONE definition, so the two can never drift). Blank = no non-
    * whitespace character (`\S`), matching the native JSON reader's
    * skip for tabs/NBSP too, not just spaces. */
  /** CSV null token (the SQL-dump convention): with the default
    * nullValue of "" an empty STRING field and a NULL are the same
    * byte sequence on disk, so parse(serialize(x)) == x is impossible
    * for data containing empty strings. Both [[writeCsv]] and the CSV
    * readers use this token, making the pair symmetric; external files
    * that encode null as empty still parse (empty string fields read
    * as "", empty typed fields quarantine visibly rather than nulling
    * silently). */
  val CsvNullToken = "\\N"

  private def parseWith(lines: DataFrame, schema: StructType,
                        csv: Boolean, skipLine: Option[String]): DataFrame = {
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol) ++
      (if (csv) Map("nullValue" -> CsvNullToken, "emptyValue" -> "") else Map.empty)
    val full = withCorrupt(schema)
    val nonBlank = lines.filter(col("value").rlike("\\S"))
    val kept = skipLine.fold(nonBlank)(h => nonBlank.filter(col("value") =!= h))
    kept.withColumn("__p",
      if (csv) from_csv(col("value"), full, opts)
      else from_json(col("value"), full, opts))
  }

  private def parsedLines(spark: SparkSession, path: String,
                          schema: StructType, csv: Boolean,
                          skipLine: Option[String]): DataFrame =
    parseWith(spark.read.text(path), schema, csv, skipLine)

  private def goodOf(parsed: DataFrame, schema: StructType): DataFrame =
    parsed
      .filter(col("__p").isNotNull && pField(CorruptCol).isNull)
      .select(schema.fieldNames.map(f => pField(f).as(f)).toIndexedSeq: _*)

  private def quarantineOf(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("__p").isNull || pField(CorruptCol).isNotNull)
      .select(col("value").as("raw_line"))

  /** Good rows of a JSONL path: schema-explicit, malformed lines
    * dropped (their accounting lives in [[jsonlQuarantine]]). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    goodOf(parsedLines(spark, path, schema, csv = false, None), schema)

  /** Quarantine side of a JSONL path: the RAW text of every line the
    * schema-parse rejects, preserved verbatim for a repair pass. */
  def jsonlQuarantine(spark: SparkSession, path: String, schema: StructType): DataFrame =
    quarantineOf(parsedLines(spark, path, schema, csv = false, None))

  /** The header line [[readCsv]]/[[csvQuarantine]] skip by default: the
    * schema's field names joined bare by commas. */
  def canonicalHeader(schema: StructType): String =
    schema.fieldNames.mkString(",")

  /** Good rows of a headered CSV path. Header skipping is an EXACT
    * text match on `headerLine` (default [[canonicalHeader]]) — a
    * distributed text read cannot know "the first line of each file",
    * so headers are a third structural class next to good/quarantine:
    * skipped from both. Two consequences callers must own: a shard
    * whose header is formatted differently (quoted fields, spaces)
    * needs that exact string passed here or its header lands in
    * quarantine (visible, not silent); and a DATA line textually equal
    * to the header is skipped as a header — with an all-string schema
    * that is the only way to keep per-file header lines out of the
    * data at all. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              headerLine: Option[String] = None): DataFrame =
    goodOf(parsedLines(spark, path, schema, csv = true,
      Some(headerLine.getOrElse(canonicalHeader(schema)))), schema)

  /** Quarantine side of a CSV path (header lines are structural — see
    * [[readCsv]] — and excluded here with the same exact match). */
  def csvQuarantine(spark: SparkSession, path: String, schema: StructType,
                    headerLine: Option[String] = None): DataFrame =
    quarantineOf(parsedLines(spark, path, schema, csv = true,
      Some(headerLine.getOrElse(canonicalHeader(schema)))))

  /** Streaming twin of [[readJsonl]]: tail a landing directory of JSONL
    * shards as a Structured Stream (the 100 TB ingest front door — new
    * files become micro-batches; downstream is the same dedup/index
    * pipeline the batch readers feed). The parse and good-row filter
    * are the SAME code as the batch reader, so the two cannot drift;
    * run [[jsonlQuarantine]] as a batch sweep over the same directory
    * for the accounting side. */
  def streamJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val lines = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType, nullable = true))))
      .text(path)
    goodOf(parseWith(lines, schema, csv = false, None), schema)
  }

  /** Write a frame as JSONL (one codegen'd `to_json(struct(...))` per
    * row — no driver involvement, splittable output). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(
        df.columns.map(c => col(s"`${c.replace("`", "``")}`")).toIndexedSeq: _*))
      .as("value"))
      .write.mode("overwrite").text(path)

  /** The documents table's explicit ingest schema (the reader contract:
    * callers name their types, nothing is inferred). */
  val DocumentsSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")

  /** Lines guaranteed unparseable as the documents schema — appended to
    * the mirror so the quarantine path runs on every catalog read. */
  val CorruptLines: Seq[String] = Seq(
    """{"doc_id": 900001, "text": "truncated""",
    "not json at all",
    """[{"an": "array"}, "not an object line"]""")

  /** Path-memoized JSONL mirror of the documents table + the injected
    * corrupt shard (the Layout write-once pattern, BuildLedger-timed):
    * the s_jsonl_roundtrip catalog query reads THIS, so the proof runs
    * the real file-based reader — schema-explicit, splittable,
    * quarantine-routing — not an in-memory from_json shortcut. */
  private val jsonlCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def documentsJsonlMirror(spark: SparkSession, dir: String): String =
    jsonlCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir", { _ =>
        graft.BuildLedger.timed("jsonl_mirror") {
          val base = graft.TempDirs.create("graft_jsonl_") + "/documents"
          writeJsonl(spark.read.parquet(s"$dir/documents.parquet"), base)
          import spark.implicits._
          CorruptLines.toDF("value").coalesce(1)
            .write.mode("append").text(base)
          base
        }
      })

  /** Write a frame as headered CSV text (one codegen'd `to_csv(struct)`
    * per row, header prepended as its own 1-line shard): the write-side
    * twin of [[readCsv]], quoting commas/quotes the way `from_csv`
    * unquotes them. Embedded NEWLINES are the one thing this layout
    * cannot carry — a quoted multi-line field would be split by the
    * line-oriented read — so callers dump line-clean tables (the
    * relational estate), not raw text corpora (those ride JSONL, which
    * escapes `\n`). */
  def writeCsv(df: DataFrame, path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val wopts = Map("nullValue" -> CsvNullToken, "emptyValue" -> "\"\"").asJava
    df.select(to_csv(struct(
        df.columns.map(c => col(s"`${c.replace("`", "``")}`")).toIndexedSeq: _*),
        wopts)
      .as("value"))
      .write.mode("overwrite").text(path)
    val spark = df.sparkSession
    import spark.implicits._
    Seq(canonicalHeader(df.schema)).toDF("value").coalesce(1)
      .write.mode("append").text(path)
  }

  /** Lines guaranteed unparseable as the customer schema — type-broken
    * key, arity-short row, unterminated quote. */
  val CsvCorruptLines: Seq[String] = Seq(
    "notanumber,Broken Customer,xx,abc,SEGMENT",
    "42,arity-short",
    "\"unterminated quote, 123,4,5.0,SEG")

  /** Path-memoized headered-CSV mirror of the customer table + injected
    * corrupt shard (the documentsJsonlMirror pattern): s_csv_roundtrip
    * reads THIS through the real splittable text-scan + from_csv reader
    * — header lines skipped structurally, malformed lines routed to
    * quarantine — while the oracle reads the original parquet. */
  private val csvCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def customerCsvMirror(spark: SparkSession, dir: String): String =
    csvCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir", { _ =>
        graft.BuildLedger.timed("csv_mirror") {
          val base = graft.TempDirs.create("graft_csv_") + "/customer"
          writeCsv(spark.read.parquet(s"$dir/customer.parquet"), base)
          import spark.implicits._
          CsvCorruptLines.toDF("value").coalesce(1)
            .write.mode("append").text(base)
          base
        }
      })

  /** Path-memoized ORC mirror of the part table. ORC is the second
    * columnar interchange format a 100 TB estate actually holds (Hive
    * warehouses); Spark's built-in source gives it the same scale
    * posture as parquet — splittable stripes, column pruning, min/max
    * predicate pushdown — with zero extra dependencies. The
    * s_orc_roundtrip catalog query reads THIS while the oracle reads
    * the original parquet, so a hash match proves the write+read chain
    * loses nothing across bigint/varchar/int/double columns. */
  private val orcCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def partOrcMirror(spark: SparkSession, dir: String): String =
    orcCache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("orc_mirror") {
        val out = graft.TempDirs.create("graft_orc_") + "/part"
        spark.read.parquet(s"$dir/part.parquet")
          .write.mode("overwrite").orc(out)
        out
      }
    })
}
