package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Pq, Sq8}

/** Durable persistence for the trained quantizer models (IVF centroids,
  * PQ codebooks, SQ8 ranges). A 100 TB pipeline trains a quantizer ONCE
  * (on a sample) and ships it to every encode/serve job thereafter —
  * the model artifact must outlive the training session, and it must be
  * a plain open format a different runtime could read, not Java
  * serialization. Each model lands as a small parquet of flattened
  * rows + a `kind` tag; floats round-trip parquet exactly (no text
  * formatting loss), so save → load is bit-identical and a reloaded
  * model reproduces the original's codes and search results
  * (ModelStoreSpec pins this).
  */
/** The artifact row (public + top-level: encoder codegen cannot access
  * a private nested class and would silently fall back to interpreted
  * projections). */
final case class ModelRow(kind: String, meta: String,
                          i: Int, j: Int, vals: Array[Float])

object ModelStore {

  private def write(spark: SparkSession, path: String, rows: Seq[ModelRow]): Unit = {
    import spark.implicits._
    rows.toDF().repartition(1).write.mode("overwrite").parquet(path)
  }

  private def read(spark: SparkSession, path: String, kind: String) = {
    import spark.implicits._
    val rows = spark.read.parquet(path).as[ModelRow].collect()
    require(rows.nonEmpty && rows.forall(_.kind == kind),
      s"model at $path is not a $kind artifact")
    rows
  }

  def saveIvf(spark: SparkSession, model: Ivf.IvfModel, path: String): Unit =
    write(spark, path, model.centroids.zipWithIndex.map { case (c, i) =>
      ModelRow("ivf", model.metricName, i, 0, c)
    }.toSeq)

  def loadIvf(spark: SparkSession, path: String): Ivf.IvfModel = {
    val rows = read(spark, path, "ivf")
    Ivf.IvfModel(rows.sortBy(_.i).map(_.vals), rows.head.meta)
  }

  def savePq(spark: SparkSession, model: Pq.PqModel, path: String): Unit =
    write(spark, path, (for {
      (sub, i) <- model.codebook.zipWithIndex
      (cent, j) <- sub.zipWithIndex
    } yield ModelRow("pq", "", i, j, cent)).toSeq)

  def loadPq(spark: SparkSession, path: String): Pq.PqModel = {
    val rows = read(spark, path, "pq")
    Pq.PqModel(rows.groupBy(_.i).toArray.sortBy(_._1)
      .map { case (_, sub) => sub.sortBy(_.j).map(_.vals) })
  }

  def saveSq8(spark: SparkSession, model: Sq8.Sq8Model, path: String): Unit =
    write(spark, path, Seq(
      ModelRow("sq8", "mins", 0, 0, model.mins),
      ModelRow("sq8", "scales", 1, 0, model.scales)))

  def loadSq8(spark: SparkSession, path: String): Sq8.Sq8Model = {
    val rows = read(spark, path, "sq8")
    def part(meta: String): Array[Float] =
      rows.find(_.meta == meta).getOrElse(throw new IllegalArgumentException(
        s"sq8 artifact at $path is missing its '$meta' row")).vals
    Sq8.Sq8Model(part("mins"), part("scales"))
  }
}
