package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-format ingestion: JSONL/CSV round-trips with explicit schemas
  * and corrupt-line quarantine (the scan-survival contract for text). */
class IngestSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("jsonl mirror: good rows round-trip exactly, corrupt lines quarantine with raw text") {
    val path = Ingest.documentsJsonlMirror(spark, sfDir)
    val good = Ingest.readJsonl(spark, path, Ingest.DocumentsSchema)
    val bad = Ingest.jsonlQuarantine(spark, path, Ingest.DocumentsSchema)
    assert(good.count() == docs.count())
    // field-exact round-trip (join on id, compare every column null-safely)
    val mismatch = good.as("g").join(docs.as("d"), Seq("doc_id"))
      .filter(!(col("g.text") <=> col("d.text")) ||
        !(col("g.lang") <=> col("d.lang")) ||
        !(col("g.source") <=> col("d.source")) ||
        !(col("g.n_chars") <=> col("d.n_chars")))
      .count()
    assert(mismatch == 0L)
    // every injected corrupt line survives in quarantine, raw
    val rawBad = bad.collect().map(_.getString(0)).toSet
    assert(rawBad == Ingest.CorruptLines.toSet)
  }

  test("csv ingest: malformed lines quarantine; well-formed rows parse with the explicit schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
    val lines = Seq(
      "id,name,score",        // header
      "1,alpha,10",
      "2,beta,20",
      "3,gamma,not_a_number", // type error -> quarantine
      "4,delta,40")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, score BIGINT")
    val good = Ingest.readCsv(spark, dir, schema)
    val bad = Ingest.csvQuarantine(spark, dir, schema)
    assert(good.count() == 3)
    assert(good.agg(sum(col("score"))).head.getLong(0) == 70L)
    assert(bad.count() == 1)
    assert(bad.head.getString(0).contains("not_a_number"))
  }

  test("customer CSV mirror: good==parquet, quarantine==injected lines, headers in neither") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
        "c_acctbal DOUBLE, c_mktsegment STRING")
    val path = Ingest.customerCsvMirror(spark, sfDir)
    val good = Ingest.readCsv(spark, path, schema)
    val pq = spark.read.parquet(s"$sfDir/customer.parquet")
    assert(good.count() == pq.count())
    // exact value round-trip including the double column
    assert(good.exceptAll(pq).count() == 0L && pq.exceptAll(good).count() == 0L)
    val bad = Ingest.csvQuarantine(spark, path, schema)
      .collect().map(_.getString(0)).toSet
    assert(bad == Ingest.CsvCorruptLines.toSet)
  }

  test("writeCsv/readCsv distinguish NULL from the empty string (the \\N token)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csvnull_").toString
    val df = Seq(
      (1L, Some("x"), Some(10L)),
      (2L, Some(""), None),    // empty string + null number
      (3L, None, Some(30L))    // null string
    ).toDF("id", "s", "n")
    Ingest.writeCsv(df, dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, s STRING, n BIGINT")
    val back = Ingest.readCsv(spark, dir, schema)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1).toSeq
    assert(back == Seq(
      (1L, Some("x"), Some(10L)),
      (2L, Some(""), None),
      (3L, None, Some(30L))))
    assert(Ingest.csvQuarantine(spark, dir, schema).count() == 0L)
  }

  test("streamJsonl tails a landing directory: new shards arrive as batches, corrupt lines drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_s_").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, s STRING")
    def shard(name: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    }
    shard("a.jsonl", Seq("""{"id": 1, "s": "x"}""", "garbage line", """{"id": 2, "s": "y"}"""))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = Ingest.streamJsonl(spark, dir, schema).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.as[(Long, String)].collect(); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.sorted == Seq((1L, "x"), (2L, "y")))
      shard("b.jsonl", Seq("""{"id": 3, "s": "z"}""", """{"broken"""))
      q.processAllAvailable()
      assert(seen.sorted == Seq((1L, "x"), (2L, "y"), (3L, "z")),
        "a newly landed shard must arrive as a later micro-batch, minus its corrupt line")
    } finally q.stop()
  }

  test("dotted field names survive the readers (no struct-navigation misparse)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dotted_").toString
    Seq("""{"user.id": 7, "payload.text": "hi"}""", "junk {")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user.id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload.text",
        org.apache.spark.sql.types.StringType)))
    val good = Ingest.readJsonl(spark, dir, schema)
    assert(good.columns.toSeq == Seq("user.id", "payload.text"))
    val row = good.collect()
    assert(row.length == 1 && row(0).getLong(0) == 7L && row(0).getString(1) == "hi")
    assert(Ingest.jsonlQuarantine(spark, dir, schema).count() == 1)
  }

  test("orc mirror: full-row round-trip vs parquet; filters push into the ORC scan") {
    val path = Ingest.partOrcMirror(spark, sfDir)
    val orc = spark.read.orc(path)
    val pq = spark.read.parquet(s"$sfDir/part.parquet")
    assert(orc.count() == pq.count())
    val mismatch = orc.as("o").join(pq.as("p"), Seq("p_partkey"))
      .filter(!(col("o.p_name") <=> col("p.p_name")) ||
        !(col("o.p_brand") <=> col("p.p_brand")) ||
        !(col("o.p_type") <=> col("p.p_type")) ||
        !(col("o.p_size") <=> col("p.p_size")) ||
        !(col("o.p_retailprice") <=> col("p.p_retailprice")))
      .count()
    assert(mismatch == 0L)
    // scale posture: the predicate must reach the ORC reader (stripe
    // skipping on min/max), and the projection must prune columns
    val plan = orc.filter(col("p_size") > 40)
      .select(col("p_partkey"), col("p_size"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,40)]"),
      s"ORC pushdown missing:\n$plan")
    assert(plan.contains("ReadSchema: struct<p_partkey:bigint,p_size:int>"),
      s"ORC column pruning missing:\n$plan")
  }

  test("writeJsonl emits one self-contained JSON object per line (splittable layout)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_w_").toString
    Ingest.writeJsonl(Seq((1L, "a\nb"), (2L, "c\"d")).toDF("id", "s"), dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.length == 2, "embedded newlines must be escaped, not emitted")
    lines.foreach { l =>
      assert(l.startsWith("{") && l.endsWith("}"), s"not an object line: $l")
    }
  }
}
