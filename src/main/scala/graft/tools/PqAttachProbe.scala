package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Resume probe for the pq_save_attach decade leg: attach a saved
  * RoutedPqIndex image, warm + covering-probe, then first/steady serve
  * with the rung's deterministic query geometry. Args: n imagePath.
  * Exists because a grep-piped rung run swallowed the attach-phase
  * stack trace — this main re-runs ONLY the post-save phases against
  * the surviving image. */
object PqAttachProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val path = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.hnsw.{HnswRoutedPq, HnswSearcher}

    val dim = 64
    val nCells = if (n >= 10000000) 256 else 64
    def centerOf(c: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        (HnswSearcher.uniformFromHash(c.toLong * 997 + d, 77L) * 20.0 - 10.0).toFloat)
    def vecOf(id: Long): Array[Float] = {
      val c = centerOf((id % nCells).toInt)
      Array.tabulate(dim)(d => c(d) +
        (HnswSearcher.uniformFromHash(id * 131 + d, 17L) * 2.0 - 1.0).toFloat)
    }
    val vecs = spark.range(n).as[Long].map(id => (id, vecOf(id))).toDF("id", "vec")
    val storage =
      if (n >= 10000000) org.apache.spark.storage.StorageLevel.DISK_ONLY
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val t2 = System.nanoTime()
    val att = HnswRoutedPq.attach(spark, path, storage = storage)
    val attachS = (System.nanoTime() - t2) / 1e9
    println(f"PROBE attach_s=$attachS%.1f")
    val tW = System.nanoTime()
    HnswRoutedPq.warm(att)
    HnswRoutedPq.warmProbe(att)
    val warmS = (System.nanoTime() - tW) / 1e9
    println(f"PROBE warm_probe_s=$warmS%.1f")
    val qIds = (0L until n by math.max(1L, n / 4000))
      .filter(_ % nCells >= 3).take(2000)
    val qDf = spark.createDataset(qIds.map(id => (id, vecOf(id))))
      .toDF("qid", "qvec").localCheckpoint(true)
    def serveCounts(): (Double, Long, Long) = {
      val t = System.nanoTime()
      val top = HnswRoutedPq.search(att, qDf, vecs, k = 1,
          nProbe = 8, candidates = 64)
        .select(col("qid"), col("id")).collect()
      val self = top.count(r => r.getLong(0) == r.getLong(1)).toLong
      val clus = top.count(r =>
        r.getLong(0) % nCells == r.getLong(1) % nCells).toLong
      ((System.nanoTime() - t) / 1e9, self, clus)
    }
    val (firstS, self1, clus1) = serveCounts()
    val (s1, _, _) = serveCounts()
    val (s2, _, _) = serveCounts()
    val steadyS = math.min(s1, s2)
    println(f"PROBE n=$n attach_s=$attachS%.1f warm_probe_s=$warmS%.1f " +
      f"first_serve_s=$firstS%.2f steady_s=$steadyS%.2f " +
      f"first_over_steady=${firstS / math.max(1e-9, steadyS)}%.1fx " +
      f"self_match=${self1 * 100.0 / qIds.length}%.1f%% " +
      f"cluster_match=${clus1 * 100.0 / qIds.length}%.1f%%")
    spark.stop()
  }
}
