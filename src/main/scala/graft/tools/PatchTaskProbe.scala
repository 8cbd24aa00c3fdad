package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

import graft.hnsw.{HnswParams, HnswRoutedCodes, HnswSearcher}

/** Diagnostic: does probed-partition pruning survive the patched
  * composite? Counts tasks of a probe-2-of-64 serve on the base vs the
  * patched index. */
object PatchTaskProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val tasks = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    def codeOf(i: Long): Long =
      java.lang.Double.doubleToRawLongBits(HnswSearcher.uniformFromHash(i, 23L))
    val baseDf = (0 until 64000).map(i => (i.toLong, codeOf(i))).toDF("id", "code")
    val params = HnswParams.standard(64, 32, 16)
    val index = HnswRoutedCodes.build(baseDf, params, nCells = 64, seed = 42L)
    val tombed = HnswRoutedCodes.delete(index, baseDf.limit(200).select("id"))
    val patched = HnswRoutedCodes.compactPatched(tombed)
    val qDf = (0 until 5).map(q => (q.toLong, codeOf(q + 900000L))).toDF("qid", "qcode")
    def measure(label: String, f: => Unit): Unit = {
      f // warm
      Thread.sleep(300); tasks.set(0)
      f
      Thread.sleep(300)
      println(s"PROBE $label tasks=${tasks.get}")
    }
    measure("base_probe2", {
      HnswRoutedCodes.search(index, qDf, 5, nProbe = 2)
        .write.format("noop").mode("overwrite").save() })
    measure("patched_probe2", {
      HnswRoutedCodes.search(patched, qDf, 5, nProbe = 2)
        .write.format("noop").mode("overwrite").save() })
    spark.stop()
  }
}
