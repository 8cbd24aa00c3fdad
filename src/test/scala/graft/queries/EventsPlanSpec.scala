package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape pins for the two Events queries rebuilt in round 5.
  *
  * e_column_stats: six exact countDistincts in ONE global agg (the
  * round-4 shape) planned an Expand that replicated every scanned row
  * x7 before the shuffle — a 700 TB intermediate at corpus scale. The
  * stack-first rewrite has exactly one distinct aggregate, so the plan
  * must contain NO Expand.
  *
  * e_value_neighbors: a RANGE window partitioned only by event_type is
  * a per-type global sort (one partition per type at any corpus size).
  * The salted rewrite partitions by (event_type, bucket); the spec pins
  * the salted key in the window spec and cross-checks counts against
  * the unsalted formulation on real data.
  */
class EventsPlanSpec extends SparkSpec {

  test("e_column_stats plans without Expand (single distinct aggregate)") {
    val df = graft.SparkEntry.queries("e_column_stats")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"Expand in plan:\n$plan")
  }

  test("e_value_neighbors window is salted by value bucket") {
    val df = graft.SparkEntry.queries("e_value_neighbors")(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the window's PARTITION SPEC itself must carry the bucket column
    // next to event_type — checking the whole plan string for "bucket"
    // would pass even if the window reverted to the per-type global
    // sort (the projection still mentions the column)
    val winSpec = "windowspecdefinition\\(([^)]*)".r
      .findFirstMatchIn(optimized).map(_.group(1))
    assert(winSpec.exists(s => s.contains("event_type") && s.contains("bucket")),
      s"window partition spec not salted: $winSpec\n$optimized")
  }

  test("e_value_density sweeps with running frames only (no RANGE frame recompute)") {
    val df = graft.SparkEntry.queries("e_value_density")(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the whole point: Spark re-evaluates a bounded RANGE frame per row
    // (O(rows x frame)); the sweep must carry only incremental
    // unbounded-preceding ROWS frames
    assert(!optimized.contains("RangeFrame"), s"RangeFrame in plan:\n$optimized")
    assert(optimized.contains("RowFrame"), s"no running frame in plan:\n$optimized")
    // hi and lo probes must pivot out of ONE window pass — two filter
    // branches would make Catalyst compute the sweep subtree twice
    val windows = df.queryExecution.executedPlan.toString
      .sliding("Window".length).count(_ == "Window")
    assert(windows === 1, s"sweep subtree duplicated ($windows Window nodes)")
  }

  test("e_value_density equals e_value_neighbors row for row") {
    val a = graft.SparkEntry.queries("e_value_density")(spark, sfDir)
    val b = graft.SparkEntry.queries("e_value_neighbors")(spark, sfDir)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("density and neighbors agree on data WITH null values (null-safe join)") {
    // the production tables carry no null values (verified at all three
    // SFs), so this builds a table that does: a plain equi-join back to
    // the rows would silently drop the null-value rows the oracle keeps
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls_").toString
    spark.read.parquet(s"$sfDir/events.parquet").limit(200)
      .withColumn("value", when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val density = graft.SparkEntry.queries("e_value_density")(spark, dir)
    val neighbors = graft.SparkEntry.queries("e_value_neighbors")(spark, dir)
    val expectedRows = spark.read.parquet(s"$dir/events.parquet").count()
    assert(density.count() === expectedRows, "density dropped null-value rows")
    assert(neighbors.count() === expectedRows, "neighbors dropped null-value rows")
    assert(density.exceptAll(neighbors).isEmpty && neighbors.exceptAll(density).isEmpty)
    // and both match the unsalted window (Spark's null peer-group
    // semantics: a null row's frame is the null peer group)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value_c"))
      .rangeBetween(-1000, 1000)
    val unsalted = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("event_type"),
        Tables.cents(col("value")).as("value_c"))
      .withColumn("n_near", count(lit(1)).over(w))
    assert(density.exceptAll(unsalted).isEmpty && unsalted.exceptAll(density).isEmpty)
  }

  test("sweep == window on randomized value distributions (boundary fuzz)") {
    // seeded-random tables exercise the marker tie-breaks (values exactly
    // R apart, heavy ties, single-value types) that curated data misses
    val rnd = new scala.util.Random(20260813L)
    import spark.implicits._
    val rows = (0 until 2000).map { i =>
      val tpe = s"t${rnd.nextInt(3)}"
      // cluster values so many pairs land exactly at +-R and at ties
      val v = (rnd.nextInt(8) * 500 + rnd.nextInt(3) * 1000).toDouble / 100.0
      (i.toLong, tpe, v)
    } :+ ((2000L, "t9", 1.23)) // a single-row type: frame = itself
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzz_").toString
    rows.toDF("event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val density = graft.SparkEntry.queries("e_value_density")(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value_c"))
      .rangeBetween(-1000, 1000)
    val window = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("event_type"),
        Tables.cents(col("value")).as("value_c"))
      .withColumn("n_near", count(lit(1)).over(w))
    assert(density.count() === window.count())
    assert(density.exceptAll(window).isEmpty && window.exceptAll(density).isEmpty)
  }

  test("e_column_stats counts nulls per column on data that has them") {
    // production tables carry no nulls, so the dual-slot null logic
    // ("both slots null == source null") needs synthetic coverage
    val dir = java.nio.file.Files.createTempDirectory("graft_colnull_").toString
    spark.read.parquet(s"$sfDir/events.parquet").limit(100)
      .withColumn("value", when(col("event_id") % 5 === 0, lit(null).cast("double"))
        .otherwise(col("value")))
      .withColumn("props", when(col("event_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("props")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = graft.SparkEntry.queries("e_column_stats")(spark, dir)
      .select("column_name", "n_nulls", "n_distinct").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src = spark.read.parquet(s"$dir/events.parquet")
    val nulls = src.filter(col("value").isNull).count()
    val nullsP = src.filter(col("props").isNull).count()
    val distinctV = src.filter(col("value").isNotNull)
      .select(floor(col("value") * 100)).distinct().count()
    assert(got("value_c") === ((nulls, distinctV)), s"value_c: ${got("value_c")}")
    assert(got("props")._1 === nullsP, s"props: ${got("props")}")
    assert(got("event_id") === ((0L, 100L)))
  }

  test("salted e_value_neighbors equals the unsalted range window") {
    import org.apache.spark.sql.expressions.Window
    val salted = graft.SparkEntry.queries("e_value_neighbors")(spark, sfDir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("value_c"))
      .rangeBetween(-1000, 1000)
    val unsalted = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("event_type"),
        Tables.cents(col("value")).as("value_c"))
      .withColumn("n_near", count(lit(1)).over(w))
    assert(salted.count() === unsalted.count())
    assert(salted.exceptAll(unsalted).isEmpty && unsalted.exceptAll(salted).isEmpty)
  }
}
