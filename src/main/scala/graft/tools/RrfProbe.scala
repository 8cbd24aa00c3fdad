package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timer for t_hybrid_rrf (round-19 optimization probe —
  * not part of the library surface). Times each sub-stage of the query
  * against the memoized bm25 table so the 5-7 s serving wall can be
  * attributed before restructuring. */
object RrfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"RRFPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm the full query once (memo builds + codegen)
    timed("full_cold")(noop(graft.SparkEntry.queries("t_hybrid_rrf")(spark, dir)))
    timed("full_warm")(noop(graft.SparkEntry.queries("t_hybrid_rrf")(spark, dir)))

    // reconstruct stages (mirrors Text.scala t_hybrid_rrf)
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet").filter(col("text").isNotNull)
    // bm25 memo parquet: find it via the query's own path — re-derive inline
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks"))
    val bm25 = tf.join(dl, "doc_id").join(dfreq, "term")
      .crossJoin(broadcast(totals))
      .withColumn("score_u", expr(
        """((n_docs * 1000000) div df) *
          |((tf * 2200 * 1000) div
          | (tf * 1000 + (1200 * (250 + (750 * ((dl * n_docs * 1000) div total_toks)) div 1000)) div 1000))
          |""".stripMargin.replace("\n", " ")))
      .select(col("doc_id"), col("term"), col("tf"), col("score_u"))
      .localCheckpoint()
    timed("bm25_materialize")(noop(bm25))

    val qterms = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("qid"), explode(split(col("text"), " ")).as("term"))
      .distinct()
      .localCheckpoint()
    timed("qterms")(noop(qterms))

    val bm25R = bm25.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val joined = qterms.join(bm25R, "term")
    timed("term_join_only")(noop(joined))

    val agg = joined.groupBy(col("qid"), col("doc_id")).agg(sum(col("score_u")).as("bm25_u"))
    timed("join_plus_agg")(noop(agg))

    val aggCk = agg.localCheckpoint()
    val lexRanks = aggCk
      .withColumn("rank_t", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("bm25_u").desc, col("doc_id"))).cast("long"))
      .filter(col("rank_t") <= 10)
    timed("window_top10")(noop(lexRanks))
    spark.stop()
  }
}
