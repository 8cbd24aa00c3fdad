package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The from-scratch Avro source/sink (avro-mapred Hadoop formats, no
  * connector jar): type coverage, null round-trips, record-reuse
  * safety, splittability posture, and the real-table round-trip.
  */
class AvroSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_avro_t_").toString + "/data"

  test("every supported type + nulls round-trips exactly") {
    val schema = StructType.fromDDL(
      "l BIGINT, i INT, d DOUBLE, f FLOAT, b BOOLEAN, s STRING, bin BINARY")
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "alpha", Array[Byte](1, 2, 3)),
      Row(null, null, null, null, null, null, null),
      Row(Long.MinValue, Int.MaxValue, Double.NaN, Float.NegativeInfinity,
        false, "", Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp()
    Avro.write(df, path)
    val back = Avro.read(spark, path, schema).collect()
      .sortBy(r => Option(r.get(0)).map(_.toString).getOrElse(""))
    assert(back.length == 3)
    val full = back.find(r => r.get(0) == 1L).get
    assert(full.getInt(1) == 2 && full.getDouble(2) == 3.5 &&
      full.getFloat(3) == 4.5f && full.getBoolean(4) &&
      full.getString(5) == "alpha" &&
      full.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    val nulls = back.find(r => r.isNullAt(0) && r.isNullAt(5))
    assert(nulls.isDefined, "all-null row must survive")
    val edge = back.find(r => r.get(0) == Long.MinValue).get
    assert(edge.getDouble(2).isNaN && edge.getString(5) == "")
  }

  test("record reuse cannot leak across rows (distinct strings survive a full scan)") {
    import spark.implicits._
    val n = 5000
    val df = (0 until n).map(i => (i.toLong, s"payload_$i"))
      .toDF("id", "s")
    val path = tmp()
    Avro.write(df, path)
    val schema = StructType.fromDDL("id BIGINT, s STRING")
    val got = Avro.read(spark, path, schema)
      .filter(col("s") === concat(lit("payload_"), col("id").cast("string")))
      .count()
    assert(got == n.toLong, "a reused Utf8/datum would repeat a later row's value")
  }

  test("writes shard with the input partitioning (splittable, parallel read-back)") {
    import spark.implicits._
    val path = tmp()
    Avro.write((0 until 1000).map(i => (i.toLong, s"v$i"))
      .toDF("id", "s").repartition(8), path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 8, s"expected 8 shards, got ${files.length}")
    val schema = StructType.fromDDL("id BIGINT, s STRING")
    assert(Avro.read(spark, path, schema)
      .agg(sum(col("id"))).head.getLong(0) == (0 until 1000).map(_.toLong).sum)
  }

  test("array<float> + element nullability round-trips exactly (the embeddings shape)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = true)))
    val rows = Seq(
      Row(1L, Seq(0.5f, -1.25f, 3.0f), Seq("a", "b")),
      Row(2L, Seq(1.0f, null, 2.0f), Seq.empty[String]), // null ELEMENT survives
      Row(3L, null, null), // null ARRAY survives
      Row(4L, Seq.empty[Float], Seq("only")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp()
    Avro.write(df, path)
    val back = Avro.read(spark, path, schema).collect().sortBy(_.getLong(0))
    assert(back.length == 4)
    assert(back(0).getSeq[Float](1) == Seq(0.5f, -1.25f, 3.0f) &&
      back(0).getSeq[String](2) == Seq("a", "b"))
    assert(back(1).getSeq[Any](1) == Seq(1.0f, null, 2.0f),
      "a null element must survive, in position")
    assert(back(2).isNullAt(1) && back(2).isNullAt(2))
    assert(back(3).getSeq[Float](1).isEmpty,
      "empty array must stay empty, not become null")
  }

  test("nested struct and array<struct> round-trip (one level and beyond)") {
    val inner = StructType(Seq(
      StructField("x", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", inner, nullable = true),
      StructField("parts", ArrayType(inner, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(1L, Row(1.5, "m1"), Seq(Row(2.5, "p1"), Row(null, "p2"))),
      Row(2L, null, Seq(null, Row(9.0, null))),
      Row(3L, Row(null, null), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp()
    Avro.write(df, path)
    val back = Avro.read(spark, path, schema).collect().sortBy(_.getLong(0))
    assert(back(0).getStruct(1).getDouble(0) == 1.5 &&
      back(0).getStruct(1).getString(1) == "m1")
    val parts0 = back(0).getSeq[Row](2)
    assert(parts0.length == 2 && parts0(0).getDouble(0) == 2.5 &&
      parts0(1).isNullAt(0) && parts0(1).getString(1) == "p2")
    assert(back(1).isNullAt(1) && back(1).getSeq[Row](2).head == null)
    assert(back(2).getStruct(1).isNullAt(0) && back(2).isNullAt(2))
  }

  test("unsupported field types fail loudly at plan time") {
    val bad = StructType(Seq(StructField("m",
      MapType(StringType, LongType), nullable = true)))
    val e = intercept[IllegalArgumentException](Avro.avroSchemaFor(bad))
    assert(e.getMessage.contains("unsupported"))
  }

  test("avro_decode: message round-trip across the type matrix; poisoned payloads null out") {
    import graft.functions.AvroFunctions
    val schema = StructType.fromDDL(
      "l BIGINT, i INT, d DOUBLE, s STRING, bin BINARY")
    val rows = Seq(
      Row(1L, 2, 3.5, "alpha", Array[Byte](9, 8)),
      Row(null, null, null, null, null),
      Row(7L, -1, 0.0, "", Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val schemaJson = Avro.avroSchemaFor(schema).toString
    val decoded = AvroFunctions.encodeMessages(df)
      .select(AvroFunctions.avroDecode(col("payload"), schemaJson).as("m"))
      .select(col("m.*"))
    val got = decoded.collect().sortBy(r =>
      Option(r.get(0)).map(_.toString).getOrElse(""))
    assert(got.length == 3)
    val full = got.find(_.get(0) == 1L).get
    assert(full.getInt(1) == 2 && full.getString(3) == "alpha" &&
      full.getAs[Array[Byte]](4).toSeq == Seq[Byte](9, 8))
    assert(got.exists(r => r.isNullAt(0) && r.isNullAt(3)))
    // scan survival: truncated/garbage payloads decode to NULL, the
    // good rows keep flowing (quarantine via IS NULL)
    import spark.implicits._
    val poisoned = AvroFunctions.encodeMessages(df)
      .union(Seq(Array[Byte](1), Array.empty[Byte]).toDF("payload"))
    val m = poisoned
      .select(AvroFunctions.avroDecode(col("payload"), schemaJson).as("m"))
    assert(m.filter(col("m").isNull).count() >= 1)
    assert(m.filter(col("m").isNotNull).count() == 3)
  }

  test("avro_decode: a prefix-compatible wrong schema NULLS, never mis-decodes; two decodes coexist in one projection") {
    import graft.functions.AvroFunctions
    import spark.implicits._
    val df = Seq((5L, "x")).toDF("id", "s")
    val rightJson = Avro.avroSchemaFor(df.schema).toString
    // field-prefix schema: would decode id and leave s's bytes trailing
    val prefixJson = Avro.avroSchemaFor(
      StructType(Seq(df.schema.fields.head))).toString
    val msgs = AvroFunctions.encodeMessages(df)
    val both = msgs.select(
      AvroFunctions.avroDecode(col("payload"), rightJson).as("good"),
      AvroFunctions.avroDecode(col("payload"), prefixJson).as("bad"))
    val r = both.head
    assert(!r.isNullAt(0) && r.getStruct(0).getLong(0) == 5L)
    assert(r.isNullAt(1),
      "a decode that leaves trailing bytes must null, not return a prefix")
  }

  test("avro_decode resolves from SQL; non-record schema fails loudly") {
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    // the decode schema must be the WRITER'S exact schema — including
    // nullability (toDF makes tuple fields non-nullable; a union where
    // the writer wrote a bare long mis-frames every later byte, since
    // single-record encoding carries no writer schema to resolve
    // against). Derive it from the same frame that encodes.
    import spark.implicits._
    val df = Seq((5L, "x")).toDF("id", "s")
    val schemaJson = Avro.avroSchemaFor(df.schema).toString.replace("\"", "\\\"")
    val msgs = graft.functions.AvroFunctions.encodeMessages(df)
    msgs.createOrReplaceTempView("graft_avro_msgs")
    val r = spark.sql(
      s"""SELECT avro_decode(payload, "${schemaJson}").s AS s
         |FROM graft_avro_msgs""".stripMargin).head
    assert(r.getString(0) == "x")
    val bad = intercept[Exception](
      graft.functions.AvroDecode(org.apache.spark.sql.catalyst.expressions.Literal(
        Array[Byte](1)), "\"long\"").dataType)
    assert(bad.getMessage.contains("record"))
  }

  test("avro_decode: array-carrying messages decode inline (embeddings over the bus)") {
    import graft.functions.AvroFunctions
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = true),
      StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("label", IntegerType, nullable = true)))
    val rows = Seq(
      Row(1L, Seq(0.25f, -0.5f, 2.0f), 7),
      Row(2L, Seq(1.0f, null), null),
      Row(3L, null, 0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val schemaJson = Avro.avroSchemaFor(schema).toString
    val got = AvroFunctions.encodeMessages(df)
      .select(AvroFunctions.avroDecode(col("payload"), schemaJson).as("m"))
      .select(col("m.*"))
      .collect().sortBy(_.getLong(0))
    assert(got.length == 3)
    assert(got(0).getSeq[Float](1) == Seq(0.25f, -0.5f, 2.0f) &&
      got(0).getInt(2) == 7)
    assert(got(1).getSeq[Any](1) == Seq(1.0f, null) && got(1).isNullAt(2),
      "null element and null scalar must survive the bus")
    assert(got(2).isNullAt(1))
    // the decoded array is a first-class column: expression arithmetic
    // (aggregate over elements) works directly on it
    val s = AvroFunctions.encodeMessages(df)
      .select(AvroFunctions.avroDecode(col("payload"), schemaJson).as("m"))
      .filter(col("m.vec_id") === 1L)
      .select(aggregate(col("m.embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double")).as("s"))
      .head.getDouble(0)
    assert(math.abs(s - 1.75) < 1e-9)
  }

  test("embeddings mirror round-trips against the parquet ground truth") {
    val path = Avro.embeddingsAvroMirror(spark, sfDir)
    val schema = StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    val avro = Avro.read(spark, path, schema)
    val pq = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(avro.count() == pq.count())
    val mismatch = avro.as("a").join(pq.as("p"), Seq("vec_id"))
      .filter(!(col("a.embedding") <=> col("p.embedding")) ||
        !(col("a.label") <=> col("p.label")))
      .count()
    assert(mismatch == 0L, "every float element must round-trip bit-exactly")
  }

  test("supplier mirror round-trips against the parquet ground truth") {
    val path = Avro.supplierAvroMirror(spark, sfDir)
    val schema = StructType.fromDDL(
      "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
    val avro = Avro.read(spark, path, schema)
    val pq = spark.read.parquet(s"$sfDir/supplier.parquet")
    assert(avro.count() == pq.count())
    val mismatch = avro.as("a").join(pq.as("p"), Seq("s_suppkey"))
      .filter(!(col("a.s_name") <=> col("p.s_name")) ||
        !(col("a.s_nationkey") <=> col("p.s_nationkey")) ||
        !(col("a.s_acctbal") <=> col("p.s_acctbal")))
      .count()
    assert(mismatch == 0L)
  }
}
