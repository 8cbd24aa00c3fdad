package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Round-19 optimization probe: wall attribution for the EXACT capped
  * containment route (the catalog's containment_pairs build — 11.4 s of
  * one_time_s at sf0.1). Times each stage standalone. Not part of the
  * library surface. Usage: ContainStageProbe <docsParquetDir>. */
object ContainStageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.spread(spark.read.parquet(args(0)))

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"CPROBE $label wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }

    // end-to-end, twice (the memo build is what the catalog pays)
    (1 to 2).foreach { i =>
      t(s"pairsAuto_full_$i") {
        val out = graft.TempDirs.create("graft_cprobe_")
        graft.operators.Containment
          .pairsAuto(docs, shingleLen = 8, num = 4, den = 5, maxDf = 200,
            route = graft.operators.Containment.Route.ExactOrFail)
          .write.mode("overwrite").parquet(out)
      }
    }

    val exploded = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFunctions.charShingleHashes(col("text"), 8)).as("s"))
    t("exploded_count")(exploded.count())
    t("estimate_x16") {
      16L * exploded.filter(pmod(col("s"), lit(16L)) === 0L)
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 200)
        .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0L)))
        .head.getAs[Number](0).longValue
    }
    val groups = t("groups_ckpt") {
      exploded.groupBy(col("s"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) <= 200)
        .localCheckpoint()
    }
    t("sizes") {
      groups.select(explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count()
    }
    t("pairs_agg") {
      groups.filter(size(col("ds")) >= 2)
        .select(array_sort(col("ds")).as("ds"))
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ds) - 1), i -> " +
            "transform(slice(ds, i + 1, size(ds) - i), " +
            "b -> struct(element_at(ds, i) AS a_id, b AS b_id))))")).as("p"))
        .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
        .agg(count(lit(1)).as("n_inter")).count()
    }
    spark.stop()
  }
}
