package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B for the q2/q16 pair-dedup shapes (round-19
  * session 2): the two candidate forms — (a) broadcast attribute join
  * then dropDuplicates(pair) (a string-buffered first() SortAggregate),
  * (b) broadcast LEFT-SEMI key filter, narrow two-long distinct, then
  * the attribute join — differ only in where the dedup sits and what it
  * carries. Cross-JVM probes of the same form swung 1.2-3.3 s on this
  * host inside an hour, so the decision needs ALTERNATING trials in one
  * session: weather drifts hit both arms equally. Prints min + all
  * trials per arm. */
object PairDedupAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Tables

    def cents(c: org.apache.spark.sql.Column) =
      (c * 100).cast("long")

    def q16(form: String): DataFrame = {
      val part = Tables(spark, sfDir, "part")
        .filter(col("p_brand") =!= "Brand#3" && col("p_size").isin(5, 10, 15, 20, 25, 30))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val li = Tables(spark, sfDir, "lineitem").select("l_partkey", "l_suppkey")
      val deduped = form match {
        case "drop" =>
          li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
            .dropDuplicates("l_partkey", "l_suppkey")
        case "semi" =>
          li.join(broadcast(part.select("p_partkey")),
              col("l_partkey") === col("p_partkey"), "left_semi")
            .distinct()
            .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      }
      deduped.groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }

    def q2(form: String): DataFrame = {
      val part = Tables(spark, sfDir, "part")
        .filter(col("p_size") >= 30 && col("p_type").endsWith("D"))
        .select("p_partkey", "p_name", "p_size", "p_type")
      val region = Tables(spark, sfDir, "region").filter(col("r_name") === "EUROPE")
      val nation = Tables(spark, sfDir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = Tables(spark, sfDir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val li = Tables(spark, sfDir, "lineitem").select("l_partkey", "l_suppkey")
      val cand = form match {
        case "old" => // round-18: dedup the WHOLE pair universe first
          li.distinct()
            .join(broadcast(part), col("l_partkey") === col("p_partkey"))
            .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        case "semi" =>
          li.join(broadcast(part.select("p_partkey")),
              col("l_partkey") === col("p_partkey"), "left_semi")
            .join(broadcast(supp.select("s_suppkey")),
              col("l_suppkey") === col("s_suppkey"), "left_semi")
            .distinct()
            .join(broadcast(part), col("l_partkey") === col("p_partkey"))
            .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      }
      val best = cand.groupBy(col("p_partkey").as("bk"))
        .agg(max(cents(col("s_acctbal"))).as("best_bal_c"))
      cand.join(broadcast(best),
          col("p_partkey") === col("bk") && cents(col("s_acctbal")) === col("best_bal_c"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          cents(col("s_acctbal")).as("s_acctbal_c"))
        .orderBy(col("s_acctbal_c").desc, col("p_partkey"), col("s_name"))
        .limit(50)
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warm pass per arm (codegen/broadcast machinery)
    Seq("drop", "semi").foreach(f => time(q16(f)))
    Seq("old", "semi").foreach(f => time(q2(f)))
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    (1 to trials).foreach { _ =>
      Seq("q16/drop" -> (() => q16("drop")), "q16/semi" -> (() => q16("semi")),
          "q2/old" -> (() => q2("old")), "q2/semi" -> (() => q2("semi")))
        .foreach { case (name, mk) => results(name) = results(name) :+ time(mk()) }
    }
    results.foreach { case (name, ts) =>
      println(f"ABPROBE $name min ${ts.min}%.2f trials ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
