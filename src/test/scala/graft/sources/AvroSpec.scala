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
