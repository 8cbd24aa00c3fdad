package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The adoption path: a user wires the WHOLE library into a vanilla
  * session through the single [[GraftExtensions]] class (the
  * `spark.sql.extensions=graft.plans.GraftExtensions` config calls
  * exactly this). One spec proves all three injection kinds land —
  * SQL functions, the top-k planner strategy, and the window optimizer
  * rule — with no `spark.experimental` installation anywhere.
  */
class GraftExtensionsSpec extends SparkSpec {

  /** A second session over the shared context, built the way the config
    * path builds it: extensions applied at session construction. */
  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prev = { spark; SparkSession.getDefaultSession } // force base init
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    try f(s)
    finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL functions resolve in an extensions-built session") {
    withExtensionSession { s =>
      val r = s.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
          |       signpack64(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT))) AS sp
          |""".stripMargin).head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(r.getLong(1) == 1L) // sign bits: [+, -] -> bit 0 set only
    }
  }

  test("the sliding-RANGE count rule is active without experimental installs") {
    withExtensionSession { s =>
      import s.implicits._
      val df = Seq((1L, "a", 10L), (2L, "a", 12L), (3L, "b", 30L))
        .toDF("id", "grp", "v")
      val q = df.withColumn("n", count(lit(1)).over(
        Window.partitionBy($"grp").orderBy($"v").rangeBetween(-5, 5)))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("specifiedwindowframe(RangeFrame, -5"),
        s"rule not active:\n$plan")
      // 10 and 12 are within +-5 of each other; 30 is alone in "b"
      assert(q.orderBy($"id").select($"n").collect().map(_.getLong(0)).toSeq
        == Seq(2L, 2L, 1L))
    }
  }

  test("the HNSW top-k strategy and rewrite are installed") {
    withExtensionSession { s =>
      assert(s.sessionState.planner.strategies
        .exists(_.isInstanceOf[HnswStrategy]),
        s.sessionState.planner.strategies.map(_.getClass.getName).mkString(", "))
    }
  }
}
