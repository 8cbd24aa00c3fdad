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
  *  - Supported field types are the analytics subset both sides of the
  *    catalog use: long/int/double/float/boolean/string/binary,
  *    nullable via union(null, T). Anything else throws at plan time,
  *    not null-corrupts at runtime (the Tables.normalizeEventTs rule).
  */
object Avro {

  /** StructType -> Avro record schema (nullable unions per field). */
  def avroSchemaFor(schema: StructType, recordName: String = "row"): Schema = {
    def leaf(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro field type: $other")
    }
    val fields = schema.fields.map { f =>
      val base = leaf(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
      new Schema.Field(f.name, t, null, null)
    }
    val rec = Schema.createRecord(recordName, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  /** Row -> GenericRecord under the field-type contract — ONE
    * definition shared by the container writer and the message encoder
    * (a drifted copy would fork the type mapping). */
  private[graft] def rowToRecord(schema: Schema, structType: StructType,
                                 r: Row): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < structType.length) {
      val v = if (r.isNullAt(i)) null else structType(i).dataType match {
        case BinaryType => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
        case _ => r.get(i).asInstanceOf[AnyRef]
      }
      rec.put(i, v)
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
            val raw = rec.get(i)
            vals(i) =
              if (raw == null) null
              else types(i) match {
                case StringType => raw.toString
                case BinaryType =>
                  val bb = raw.asInstanceOf[java.nio.ByteBuffer]
                  val out = new Array[Byte](bb.remaining())
                  bb.duplicate().get(out); out
                case _ => raw
              }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

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
}
