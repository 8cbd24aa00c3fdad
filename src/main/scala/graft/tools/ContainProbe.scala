package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** One-off wall attribution for the routed containment plan's stages
  * (not part of the library surface): times each stage of the LSH
  * route standalone on a rehearsal corpus so optimization effort goes
  * where the seconds are. Usage: ContainProbe <docsParquetDir>.
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(args(0))

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val exploded = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFunctions.charShingleHashes(col("text"), 8)).as("s"))

    t("exploded_scan")(exploded.count())
    t("estimate_sampled") {
      // x16 scale-up mirrors estimateFromExploded — the printed number
      // is the one the router compares against candidateBudget
      16L * exploded.filter(pmod(col("s"), lit(16L)) === 0L)
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 200)
        .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0L)))
        .head.getAs[Number](0).longValue
    }
    t("heavy_full_hist") {
      exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 200).count()
    }
    t("kept_sets") {
      val heavy = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 200).select(col("s"))
      exploded.join(broadcast(heavy), Seq("s"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(collect_list(col("s")).as("sh"), count(lit(1)).as("n"))
        .count()
    }
    t("banding_candidates") {
      graft.operators.Containment.minhashCandidates(docs, 8, 18, 7).count()
    }
    spark.stop()
  }
}
