package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-record Avro payload decode as a Catalyst EXPRESSION — the
  * message-bus shape: a binary column of Avro-encoded records (Kafka
  * values, event-bus payloads) decoded to a typed STRUCT inline in the
  * plan, no UDF, no connector jar. The schema is a plan-time string
  * literal, so the output StructType is fixed at analysis and column
  * pruning / filter pushdown work above the decode as usual.
  *
  * THE SCHEMA MUST BE THE WRITER'S EXACT SCHEMA, nullability included:
  * single-record encoding carries no writer schema to resolve against,
  * so a union where the producer wrote a bare long mis-frames every
  * subsequent byte (decoding then nulls the row via the survival
  * path, it does not mis-decode silently — but the fix is the right
  * schema, the one [[AvroFunctions.encodeMessages]] derives from the
  * producing frame).
  *
  * Poisoned payloads return NULL instead of killing the scan (the
  * media-decode contract): at bus scale a malformed message is an
  * accounting row, not a job failure — pair with an `IS NULL` filter
  * for the quarantine side.
  */
case class AvroDecode(child: Expression, schemaJson: String)
    extends UnaryExpression {
  override def prettyName: String = "avro_decode"
  override def nullable: Boolean = true // malformed payloads decode to null

  @transient private lazy val avroSchema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](avroSchema)

  // lazy: tree copies (withNewChildInternal etc.) happen dozens of
  // times per plan; re-parsing the schema JSON on each would be
  // plan-time waste growing with schema size
  override lazy val dataType: DataType = AvroDecode.catalystType(schemaJson)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"avro_decode needs a binary payload, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
      val rec = reader.read(null, decoder)
      // a decode that leaves trailing bytes consumed a prefix under a
      // wrong-but-prefix-compatible schema — that is a mis-framed
      // payload, not a success (the documented null-don't-mis-decode
      // contract)
      if (!decoder.isEnd) return null
      AvroDecode.toInternalStruct(dataType.asInstanceOf[StructType], rec)
    } catch {
      case _: Exception => null // scan-survival: poisoned payload -> null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val expr = ctx.addReferenceObj("avrodec", this, classOf[AvroDecode].getName)
      // freshName: two decodes in one codegen scope must not collide
      val r = ctx.freshName("avroRec")
      s"""
         |Object $r = $expr.nullSafeEval($c);
         |if ($r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (${classOf[InternalRow].getName}) $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AvroDecode {
  /** Avro record schema JSON -> Catalyst StructType. Arrays map to
    * ArrayType (element nullability from a (null, T) union on the
    * element), nested records to nested StructTypes — recursively,
    * mirroring [[graft.sources.Avro.avroSchemaFor]]. Unions must be
    * (null, T). */
  def catalystType(schemaJson: String): StructType = {
    val schema = new Schema.Parser().parse(schemaJson)
    require(schema.getType == Schema.Type.RECORD,
      s"avro_decode needs a record schema, got ${schema.getType}")
    struct(schema)
  }

  /** (datatype, nullable) for a possibly-union-wrapped Avro schema. */
  private def convert(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes
      require(branches.size == 2 &&
        branches.get(0).getType == Schema.Type.NULL,
        s"only (null, T) unions supported: $s")
      (convert(branches.get(1))._1, true)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = convert(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.RECORD => (struct(s), false)
    case other => throw new IllegalArgumentException(
      s"unsupported Avro type: $other")
  }

  private def struct(s: Schema): StructType =
    StructType(s.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      val (t, nullable) = convert(f.schema())
      StructField(f.name(), t, nullable)
    })

  /** Decoded Avro value -> Catalyst INTERNAL value (UTF8String,
    * GenericArrayData, GenericInternalRow), recursively. */
  private def toInternal(dt: DataType, raw: Any): Any =
    if (raw == null) null else dt match {
      case StringType => UTF8String.fromString(raw.toString)
      case BinaryType =>
        val bb = raw.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out); out
      case ArrayType(et, _) =>
        val c = raw.asInstanceOf[java.util.Collection[_]]
        val out = new Array[Any](c.size)
        val it = c.iterator(); var i = 0
        while (it.hasNext) { out(i) = toInternal(et, it.next()); i += 1 }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case st: StructType => toInternalStruct(st, raw.asInstanceOf[GenericRecord])
      case _ => raw
    }

  private[functions] def toInternalStruct(st: StructType, rec: GenericRecord): InternalRow = {
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      vals(i) = toInternal(st(i).dataType, rec.get(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}

object AvroFunctions {
  /** Decode a binary Avro-payload column to a struct. */
  def avroDecode(payload: Column, schemaJson: String): Column =
    Bridge.column(AvroDecode(Bridge.expression(payload), schemaJson))

  /** Encode each row of `df` to single-record Avro bytes — the message
    * PRODUCER side, for round-trip proofs and bus-landing simulation.
    * One encoder per partition, re-used buffer, no driver involvement. */
  def encodeMessages(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val structType = df.schema
    val avroJson = graft.sources.Avro.avroSchemaFor(structType).toString
    val enc = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new java.io.ByteArrayOutputStream(256)
      // encoder REUSED across the partition via the factory's reuse
      // parameter (a fresh buffered encoder per row is ~2KB of garbage
      // on the hot path)
      var e: org.apache.avro.io.BinaryEncoder = null
      rows.map { r =>
        bos.reset()
        e = EncoderFactory.get().binaryEncoder(bos, e)
        writer.write(graft.sources.Avro.rowToRecord(schema, structType, r), e)
        e.flush()
        org.apache.spark.sql.Row(bos.toByteArray)
      }
    }
    df.sparkSession.createDataFrame(enc,
      StructType(Seq(StructField("payload", BinaryType, nullable = false))))
  }
}
