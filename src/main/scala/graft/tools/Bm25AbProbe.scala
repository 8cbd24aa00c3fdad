package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for the bm25_scores memo BUILD: flat scan
  * (round-19 shape, single-split explode + aggregations) vs
  * Tables.spread on the docs input. Both arms are verbatim copies of
  * Text.bm25Scores' build body writing to throwaway dirs; alternating
  * BABA so weather hits both arms equally. */
object Bm25AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def build(docsIn: DataFrame): Double = {
      val t0 = System.nanoTime()
      val out = graft.TempDirs.create("graft_bm25ab_")
      val docs = docsIn.filter(col("text").isNotNull)
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .cache()
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val totals = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_toks"))
      tf.join(dl, "doc_id").join(dfreq, "term")
        .crossJoin(broadcast(totals))
        .withColumn("score_u", expr(
          """((n_docs * 1000000) div df) *
            |((tf * 2200 * 1000) div
            | (tf * 1000 + (1200 * (250 + (750 * ((dl * n_docs * 1000) div total_toks)) div 1000)) div 1000))
            |""".stripMargin.replace("\n", " ")))
        .select(col("doc_id"), col("term"), col("tf"), col("score_u"))
        .write.mode("overwrite").parquet(out)
      tf.unpersist(blocking = false)
      (System.nanoTime() - t0) / 1e9
    }

    def docsFlat = spark.read.parquet(s"$sfDir/documents.parquet")
    build(docsFlat); build(graft.queries.Tables.spread(docsFlat)) // warm
    val a = Array.newBuilder[Double]; val b = Array.newBuilder[Double]
    (1 to trials).foreach { i =>
      val tb = build(graft.queries.Tables.spread(docsFlat))
      val ta = build(docsFlat)
      println(f"trial $i: spread $tb%.2f s  flat $ta%.2f s")
      b += tb; a += ta
    }
    println(f"min-of-$trials: spread ${b.result().min}%.2f s  flat ${a.result().min}%.2f s")
    spark.stop()
  }
}
