package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for the source-overlap intersection shapes
  * (round-19 session 2): change #13 replaced the hash self-join (two
  * full shuffles of the (source, shingle) universe) with one
  * groupBy(hash) pass generating ordered source pairs map-side, citing
  * "locally a wash"; today's weather-degraded reads suggested the
  * grouped pass costs more locally than recorded. Both downstreams run
  * here over the SAME checkpointed universe with ALTERNATING trials, so
  * weather drift hits both arms equally and the one-time explode /
  * distinct is outside the timed region (it is identical in both). */
object SourceOverlapAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Kmv
    import graft.queries.Tables

    val fiveGramExpr =
      "array_distinct(transform(sequence(1, greatest(size(toks)-4, 1))," +
        " i -> concat_ws(' ', slice(toks, i, 5))))"
    val universe = Tables.spread(
        Tables(spark, sfDir, "documents").filter(col("text").isNotNull))
      .select(col("source"), split(col("text"), " ").as("toks"))
      .select(col("source"), explode(expr(fiveGramExpr)).as("ngram"))
      .distinct()
      .localCheckpoint()
    // the xxhash64 row's frame (d_source_overlap)
    val grams = universe
      .select(col("source"), xxhash64(col("ngram")).as("ngram"))
      .localCheckpoint()
    // the md5-48 row's frame (d_source_overlap_kmv)
    val sh = universe
      .select(col("source"), Kmv.hash48(col("ngram")).as("h"))
      .distinct()
      .localCheckpoint()
    val k = 256

    def pairsFromGroups(df: DataFrame, keyCol: String): DataFrame =
      df.groupBy(col(keyCol)).agg(collect_list(col("source")).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(array_sort(col("ss")).as("ss"))
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ss) - 1), i -> " +
            "transform(slice(ss, i + 1, size(ss) - i), " +
            "b -> struct(element_at(ss, i) AS a_source, b AS b_source))))")).as("p"))
        .groupBy(col("p.a_source").as("a_source"), col("p.b_source").as("b_source"))
        .agg(count(lit(1)).as("n_shared"))

    def pairsFromSelfJoin(df: DataFrame, keyCol: String): DataFrame =
      df.as("x").join(df.as("y"),
          col(s"x.$keyCol") === col(s"y.$keyCol") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("a_source"), col("y.source").as("b_source"))
        .agg(count(lit(1)).as("n_shared"))

    def overlap(form: String): DataFrame = {
      val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val shared = if (form == "join") pairsFromSelfJoin(grams, "ngram")
        else pairsFromGroups(grams, "ngram")
      shared
        .join(sizes.select(col("source").as("a_source"), col("n").as("a_n")), "a_source")
        .join(sizes.select(col("source").as("b_source"), col("n").as("b_n")), "b_source")
        .withColumn("jaccard_bp",
          expr("n_shared * 10000 div (a_n + b_n - n_shared)"))
        .select(col("a_source"), col("b_source"), col("n_shared"), col("jaccard_bp"))
        .orderBy(col("a_source"), col("b_source"))
    }

    def overlapKmv(form: String): DataFrame = {
      val shared = if (form == "join") pairsFromSelfJoin(sh, "h")
        else pairsFromGroups(sh, "h")
      val (pairs0, withSizes) = if (form == "join") {
        val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val sk = sh.groupBy(col("source"))
          .agg(Kmv.sketchAgg(k)(col("h")).getField("hs").as("kmv"))
        val p = sk.select(col("source").as("a_source"), col("kmv").as("kmv_a"))
          .join(sk.select(col("source").as("b_source"), col("kmv").as("kmv_b")),
            col("a_source") < col("b_source"))
        (p, (d: DataFrame) => d
          .join(sizes.select(col("source").as("a_source"), col("n").as("a_n")), "a_source")
          .join(sizes.select(col("source").as("b_source"), col("n").as("b_n")), "b_source"))
      } else {
        val perSource = sh.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            Kmv.sketchAgg(k)(col("h")).getField("hs").as("kmv"))
          .localCheckpoint()
        val p = perSource.select(col("source").as("a_source"),
            col("kmv").as("kmv_a"), col("n").as("a_n"))
          .join(perSource.select(col("source").as("b_source"),
            col("kmv").as("kmv_b"), col("n").as("b_n")),
            col("a_source") < col("b_source"))
        (p, (d: DataFrame) => d)
      }
      withSizes(pairs0)
        .join(shared, Seq("a_source", "b_source"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .withColumn("jaccard_bp_exact",
          expr("n_shared * 10000 div (a_n + b_n - n_shared)"))
        .withColumn("jaccard_bp_kmv", Kmv.jaccardBp(col("kmv_a"), col("kmv_b"), k))
        .select(col("a_source"), col("b_source"), col("jaccard_bp_exact"),
          col("jaccard_bp_kmv"),
          abs(col("jaccard_bp_kmv") - col("jaccard_bp_exact")).as("err_bp"))
        .orderBy(col("a_source"), col("b_source"))
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("join", "group").foreach { f => time(overlap(f)); time(overlapKmv(f)) } // warm
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    (1 to trials).foreach { _ =>
      Seq("overlap/join" -> (() => overlap("join")),
          "overlap/group" -> (() => overlap("group")),
          "kmv/join" -> (() => overlapKmv("join")),
          "kmv/group" -> (() => overlapKmv("group")))
        .foreach { case (name, mk) => results(name) = results(name) :+ time(mk()) }
    }
    results.foreach { case (name, ts) =>
      println(f"ABPROBE $name min ${ts.min}%.2f trials ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
