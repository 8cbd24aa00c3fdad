package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZorderSpec extends SparkSpec {

  test("zvalue2 interleaves bits (a on even positions, b on odd)") {
    import spark.implicits._
    val rows = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.zvalue2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // spread(3)=0b101=5; spread(5)=0b10001=17 -> z = 5 | (17<<1) = 39
    assert(rows.toSeq == Seq(1L, 2L, 39L, 0xFFFFFFFFL))
  }

  // sf0.001 events: user_id 0..14, value 0..328 — this box holds ~11%
  private def boxFilter(df: DataFrame): DataFrame =
    df.filter(col("user_id").between(2, 6) &&
      col("value") >= 20.0 && col("value") < 60.0)

  /** Rows leaving the parquet scan node = rows in row groups that
    * SURVIVED min/max skipping (the Filter above does the per-row work).
    * The plain scan+filter plan has no exchange, so no AQE wrapper. */
  private def scanOutputRows(df: DataFrame): Long = {
    // collect() runs df's OWN QueryExecution (count() would plan a new
    // one whose metrics this accessor can't see)
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    scan.metrics("numOutputRows").value
  }

  test("z-ordered box scan skips most row groups; unsorted layout cannot") {
    val zdir = Layout.eventsZordered(spark, sfDir)
    // control: same data, same small block size, no z-clustering
    val udir = java.nio.file.Files.createTempDirectory("graft_evplain_").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(24)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(udir)

    val zRows = scanOutputRows(boxFilter(spark.read.parquet(zdir)))
    val uRows = scanOutputRows(boxFilter(spark.read.parquet(udir)))
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    // the unsorted layout's random distribution leaves every row group
    // intersecting the box; z-order confines the box to few groups
    assert(zRows < total / 2, s"z-scan read $zRows of $total")
    assert(zRows < uRows, s"z-scan $zRows not better than unsorted $uRows")
  }

  test("z-ordered scan result equals the plain scan result") {
    val zdir = Layout.eventsZordered(spark, sfDir)
    val z = boxFilter(spark.read.parquet(zdir))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val p = boxFilter(spark.read.parquet(s"$sfDir/events.parquet"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(z == p && z.nonEmpty)
  }

  test("both range predicates are pushed to the parquet reader") {
    val zdir = Layout.eventsZordered(spark, sfDir)
    // plan.toString truncates metadata — read the scan node's full list
    val df = boxFilter(spark.read.parquet(zdir))
    val pushed = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s.metadata("PushedFilters")
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(pushed.contains("GreaterThanOrEqual(user_id,2)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(value,20.0)"), pushed)
    assert(pushed.contains("LessThan(value,60.0)"), pushed)
  }
}
