package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LshPlan}

/** Scratch: split v_neardup_lsh_recall's cost into its parts (signature,
  * planned-banding LSH, brute-force truth). Not library surface. */
object LshPartsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions._

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    e.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"LSHPARTS $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val p = LshPlan.plan(0.45, 0.95, 512, n = 10000L)
    println(s"LSHPARTS plan bands=${p.bands} r=${p.rowsPerBand} " +
      f"bg=${p.bgCandidatesPerPair}%.3f recall=${p.recallBound}%.4f")
    t("signature") {
      val sig = Dedup.simhashSig(512, 64, 7L)
      e.select(col("vec_id"), sig(col("embedding")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 2).foreach { i =>
      t(s"lsh_planned_$i") {
        Dedup.neardupLsh(e, "vec_id", "embedding", 0.45,
            nBits = 512, bands = p.bands, rowsPerBand = p.rowsPerBand)
          .write.format("noop").mode("overwrite").save()
      }
    }
    t("brute_truth") {
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
      a.join(b, col("a_id") < col("b_id"))
        .filter(cosineSim(col("a_vec"), col("b_vec")) >= 0.45)
        .select("a_id", "b_id")
        .write.format("noop").mode("overwrite").save()
    }
    t("lsh_parity") {
      Dedup.neardupLsh(e, "vec_id", "embedding", 0.45,
          nBits = 512, bands = 102, rowsPerBand = 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
