package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading + oracle-parity helpers shared by the query catalog.
  *
  * Oracle-parity rules (the driver hash-compares our parquet output against
  * DuckDB running `SparkEntry.oracleSql` on the same files):
  *  - Scalar double arithmetic is IEEE-deterministic: the same expression
  *    tree over the same input doubles yields bit-identical results in any
  *    engine. Safe everywhere.
  *  - Double AGGREGATION (sum/avg) is NOT order-deterministic. Never sum
  *    raw doubles: integerize first via [[Tables.cents]] (floor(x*100) ->
  *    long) so sums are exact integers. min/max/count are always safe.
  *  - Column names and types must match the oracle SQL exactly (alias both
  *    sides; cast DuckDB's HUGEINT sums back to BIGINT).
  *  - Every query ends with a deterministic ORDER BY on a unique key.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Deterministic money integerization: floor(x*100) as long ("cents"). */
  def cents(c: Column): Column = floor(c * 100)

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark reads as a long
    * (spark.sql.legacy.parquet.nanosAsLong=true, set by all our session
    * builders); this converts to a proper timestamp. The long->double hop
    * can be off by <1us at 2024 epochs — only use the result for coarse
    * bucketing (hour/day strings); exact comparisons use the raw nanos. */
  def tsFromNanos(c: Column): Column = timestamp_micros((c / 1000).cast("long"))
}
