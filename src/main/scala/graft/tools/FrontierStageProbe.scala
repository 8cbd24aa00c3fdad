package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{GraphFrames, HnswDistributed, HnswFrontier, HnswParams}
import graft.hnsw.HnswDistributed.BuildConfig

/** Stage-level attribution of one warm frontier search: prints every
  * job/stage with submit->complete wall span, task count and summed task
  * time, so the per-round ~0.7 s can be split into task work vs
  * scheduling/planning gaps. */
object FrontierStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.applyConfigs(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cfg = BuildConfig(
      HnswParams.standard(efConstruction = 64, efSearch = 128, m = 16),
      metric = "cosine", seed = 42L)
    val model = HnswDistributed.buildCached(vectors, cfg, sfDir)
    val links = GraphFrames.toLinksDF(spark, model.snapshot)
    val upper = HnswFrontier.upperSnapshot(model.snapshot)

    def serve(): Unit =
      HnswFrontier.search(links, upper, vectors, queries, k = 10, ef = 128)
        .write.format("noop").mode("overwrite").save()
    serve(); serve() // warm

    @volatile var collecting = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      private val subs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (collecting) lines.add(f"JOB ${j.jobId}%4d start t=${j.time}")
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (collecting) lines.add(f"JOB ${j.jobId}%4d end   t=${j.time}")
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (collecting) subs.put(s.stageInfo.stageId, System.currentTimeMillis())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = s.stageInfo
          val wall = for {
            a <- si.submissionTime; b <- si.completionTime
          } yield b - a
          lines.add(f"  STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall=${wall.getOrElse(-1L)}%5d ms  ${si.name.take(80)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    collecting = true
    val t0 = System.nanoTime()
    serve()
    val wall = (System.nanoTime() - t0) / 1e9
    collecting = false
    Thread.sleep(500)
    lines.forEach(l => println(l))
    println(f"TOTAL serve wall $wall%.2f s")
    spark.stop()
  }
}
