package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the avro-mapred
  * Hadoop formats that SHIP with Spark — the spark-avro connector jar
  * is deliberately not a dependency. Avro is the third interchange
  * format a 100 TB estate actually holds (Kafka archives, legacy MR
  * pipelines); container files are block-splittable, so the read
  * parallelizes like parquet/ORC even though it is row-major.
  *
  * Design rules, matching [[Ingest]]:
  *  - **Schema is EXPLICIT** (a `StructType`, mapped to an Avro record
  *    schema with nullable unions). No inference pass.
  *  - **Record reuse is respected**: the Avro record reader REUSES the
  *    key wrapper and datum across `next()` calls, so every field is
  *    copied out (Utf8 -> String, ByteBuffer -> Array[Byte]) inside
  *    the same iterator step that received it — holding a datum across
  *    steps would silently see later rows' values.
  *  - Supported field types: long/int/double/float/boolean/string/
  *    binary, plus `array<T>` (Avro array, element nullability as a
  *    (null, T) union on the element) and nested structs (nested
  *    named records) — recursively, so `array<struct<...>>` and
  *    deeper shapes work too. Nullable via union(null, T). Maps and
  *    anything else throw at plan time, not null-corrupt at runtime
  *    (the Tables.normalizeEventTs rule).
  */
object Avro {

  /** StructType -> Avro record schema (nullable unions per field).
    * Arrays map to Avro arrays (element nullability as a (null, T)
    * union on the ELEMENT schema) and nested structs to nested named
    * records — so the engine's own native column type
    * (`embedding: array<float>`, the testdata contract) rides its own
    * bus. Nested record names are parent-qualified: Avro requires
    * distinct full names per named type in one schema. */
  def avroSchemaFor(schema: StructType, recordName: String = "row"): Schema = {
    def convert(dt: DataType, path: String): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(elem, containsNull) =>
        Schema.createArray(nullableWrap(convert(elem, path + "_item"), containsNull))
      case st: StructType => record(st, path)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro field type: $other")
    }
    def record(st: StructType, name: String): Schema = {
      val fields = st.fields.map { f =>
        val t = nullableWrap(convert(f.dataType, s"${name}_${f.name}"), f.nullable)
        new Schema.Field(f.name, t, null, null)
      }
      val rec = Schema.createRecord(name, null, "graft", false)
      rec.setFields(java.util.Arrays.asList(fields: _*))
      rec
    }
    record(schema, recordName)
  }

  private def nullableWrap(base: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base

  /** A possibly-(null, T)-union schema -> its value branch. */
  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) s.getTypes.get(1) else s

  /** Spark EXTERNAL value -> Avro value under the matching (possibly
    * union-wrapped) Avro schema — the recursive arm rowToRecord and the
    * container writer share. */
  private def toAvro(dt: DataType, fieldSchema: Schema, v: Any): AnyRef =
    if (v == null) null else dt match {
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ArrayType(elem, _) =>
        val arr = unwrap(fieldSchema)
        val seq = v.asInstanceOf[scala.collection.Seq[_]]
        val out = new java.util.ArrayList[AnyRef](seq.length)
        val it = seq.iterator
        while (it.hasNext) out.add(toAvro(elem, arr.getElementType, it.next()))
        out
      case st: StructType =>
        val rs = unwrap(fieldSchema)
        val r = v.asInstanceOf[Row]
        val rec = new GenericData.Record(rs)
        var i = 0
        while (i < st.length) {
          rec.put(i, toAvro(st(i).dataType, rs.getFields.get(i).schema(),
            if (r.isNullAt(i)) null else r.get(i)))
          i += 1
        }
        rec
      case _ => v.asInstanceOf[AnyRef]
    }

  /** Avro value -> Spark EXTERNAL value. COPIES every string/binary/
    * array/record out (the record-reuse contract: the avro-mapred
    * reader reuses datum objects across next() calls). */
  private def fromAvro(dt: DataType, raw: Any): Any =
    if (raw == null) null else dt match {
      case StringType => raw.toString
      case BinaryType =>
        val bb = raw.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out); out
      case ArrayType(elem, _) =>
        val c = raw.asInstanceOf[java.util.Collection[_]]
        val out = new Array[Any](c.size)
        val it = c.iterator(); var i = 0
        while (it.hasNext) { out(i) = fromAvro(elem, it.next()); i += 1 }
        out.toIndexedSeq
      case st: StructType =>
        val rec = raw.asInstanceOf[GenericRecord]
        val vals = new Array[Any](st.length)
        var i = 0
        while (i < st.length) { vals(i) = fromAvro(st(i).dataType, rec.get(i)); i += 1 }
        Row.fromSeq(vals.toIndexedSeq)
      case _ => raw
    }

  /** Row -> GenericRecord under the field-type contract — ONE
    * definition shared by the container writer and the message encoder
    * (a drifted copy would fork the type mapping). */
  private[graft] def rowToRecord(schema: Schema, structType: StructType,
                                 r: Row): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < structType.length) {
      rec.put(i, toAvro(structType(i).dataType, schema.getFields.get(i).schema(),
        if (r.isNullAt(i)) null else r.get(i)))
      i += 1
    }
    rec
  }

  /** Write a frame as Avro container files under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val structType = df.schema
    val avroJson = avroSchemaFor(structType).toString
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      rows.map { r =>
        (new AvroKey[GenericRecord](rowToRecord(schema, structType, r)),
          NullWritable.get)
      }
    }
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroJson))
    // pin the writer's data model to GenericData: the format's default
    // ReflectDatumWriter resolves union-typed ARRAY ELEMENTS through
    // Java reflection against our record names (which are schema names,
    // not classes) and NPEs; GenericDatumWriter resolves unions by
    // datum shape, which is what GenericRecord rows are
    org.apache.avro.hadoop.io.AvroSerialization.setDataModelClass(
      job.getConfiguration, classOf[GenericData])
    rdd.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read Avro container files under `path` with the EXPLICIT reader
    * schema (Avro resolves writer->reader schemas per its own rules). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val avroJson = avroSchemaFor(schema).toString
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(avroJson))
    // GenericData reader for the same reason as the writer: the default
    // ReflectDatumReader resolves our schema-only record names through
    // Java reflection and NPEs on union-typed array elements
    org.apache.avro.hadoop.io.AvroSerialization.setDataModelClass(
      job.getConfiguration, classOf[GenericData])
    val n = schema.length
    val types = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        it.map { case (k, _) =>
          // copy EVERY field out before the reader's next reuse cycle
          val rec = k.datum()
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) {
            vals(i) = fromAvro(types(i), rec.get(i))
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Write a frame as base64-lines Avro message shards — the bus
    * LANDING shape (one single-record Avro message per line, base64
    * over the text transport, the Kinesis/Firehose convention):
    * producer twin of [[streamMessageLines]]. */
  def writeMessageLines(df: DataFrame, path: String): Unit =
    graft.functions.AvroFunctions.encodeMessages(df)
      .select(org.apache.spark.sql.functions.base64(
        org.apache.spark.sql.functions.col("payload")).as("value"))
      .write.mode("overwrite").text(path)

  /** Batch reader for base64-lines Avro message shards: decode INLINE
    * via the avro_decode expression. Output is one nullable struct
    * column `m` — null rows are the quarantine side (bad base64 or
    * mis-framed payloads), `m.*` the good side; the caller splits,
    * exactly the [[Ingest.readJsonl]] contract. */
  def readMessageLines(spark: SparkSession, path: String,
                       schemaJson: String): DataFrame =
    decodeLines(spark.read.text(path), schemaJson)

  /** Streaming twin of [[readMessageLines]]: tail the landing directory
    * as a Structured Stream — new shards become micro-batches feeding
    * the same two-phase index ingest the batch path feeds. The decode
    * is the SAME expression as the batch reader, so the two cannot
    * drift. */
  def streamMessageLines(spark: SparkSession, path: String,
                         schemaJson: String): DataFrame =
    decodeLines(
      spark.readStream
        .schema(StructType(Seq(StructField("value", StringType, nullable = true))))
        .text(path),
      schemaJson)

  private def decodeLines(lines: DataFrame, schemaJson: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, try_to_binary, lit}
    // try_to_binary, NOT unbase64: unbase64 THROWS on malformed base64
    // (killing the whole scan on one bad line); try_to_binary nulls it,
    // and avro_decode's null-intolerant input turns that into the same
    // null-quarantine row a mis-framed payload gets
    lines.select(graft.functions.AvroFunctions
      .avroDecode(try_to_binary(col("value"), lit("base64")), schemaJson).as("m"))
  }

  /** Path-memoized Avro mirror of orders packed as a NESTED record
    * (o_orderkey, meta: struct<priority, status, total_c>) — the
    * s_avro_nested catalog row reads and flattens this vs the plain
    * parquet oracle, proving nested named records round-trip. */
  private val nestedCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def ordersNestedAvroMirror(spark: SparkSession, dir: String): String =
    nestedCache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("avro_nested_mirror") {
        import org.apache.spark.sql.functions.{col, struct, floor}
        val out = graft.TempDirs.create("graft_avro_") + "/orders_nested"
        write(spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"),
            struct(col("o_orderpriority").as("priority"),
              col("o_orderstatus").as("status"),
              floor(col("o_totalprice") * 100).cast("long").as("total_c"))
              .as("meta")), out)
        out
      }
    })

  /** Path-memoized Avro mirror of the supplier table — the
    * s_avro_roundtrip catalog row reads THIS while the oracle reads
    * the parquet, proving write+read lossless across
    * bigint/varchar/int/double (the ORC-mirror pattern). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def supplierAvroMirror(spark: SparkSession, dir: String): String =
    cache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("avro_mirror") {
        val out = graft.TempDirs.create("graft_avro_") + "/supplier"
        write(spark.read.parquet(s"$dir/supplier.parquet"), out)
        out
      }
    })

  /** Path-memoized Avro mirror of the embeddings table — the engine's
    * own native vector type (`embedding: array<float>`) through its own
    * Avro layer. The s_avro_embeddings catalog row reads THIS and
    * digests every element positionally vs the parquet oracle. */
  private val vecCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def embeddingsAvroMirror(spark: SparkSession, dir: String): String =
    vecCache.computeIfAbsent(dir, { _ =>
      graft.BuildLedger.timed("avro_vec_mirror") {
        val out = graft.TempDirs.create("graft_avro_") + "/embeddings"
        write(spark.read.parquet(s"$dir/embeddings.parquet"), out)
        out
      }
    })
}
