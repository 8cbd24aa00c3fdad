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
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Synthetic/minimal events tables (spec fixtures) may omit ts entirely;
    // they only exercise non-ts queries, so pass them through untouched.
    if (name == "events" && df.columns.contains("ts")) normalizeEventTs(df)
    else df
  }

  /** The catalog's internal convention for events.ts is NANOSECONDS AS
    * LONG; the generator has shipped the column both as parquet
    * TIMESTAMP(NANOS) (which Spark reads as a raw long under
    * spark.sql.legacy.parquet.nanosAsLong, set by all our session
    * builders) and as a micro-precision TIMESTAMP (which Spark reads as
    * TIMESTAMP_NTZ). Normalize by ACTUAL read type, so every downstream
    * `ts div 1000` keeps working against either vintage. The NTZ →
    * instant cast is exact under the session's pinned UTC timezone, and
    * micros*1000 loses nothing the oracle sees: DuckDB reads the same
    * column as a native timestamp in both vintages and all oracle SQL
    * goes through epoch_us/strftime, which agree with this mapping. */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType => df.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      // An unexpected vintage must fail loudly, not silently null out ts.
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected long nanos or timestamp)")
    }
  }

  /** Spread an under-parallelized scan before an expensive per-row
    * kernel. The catalog's single-row-group parquet files plan exactly
    * ONE scan split, so every CPU-heavy projection over them (token
    * kernels, regex redaction, media decode) ran on one core no matter
    * how many the session has — measured at sf0.1: t_repetition 2.1 s,
    * m_audio_decode 2.1 s, both single-task. Repartitions ONLY when the
    * planned scan has fewer splits than the session's parallelism, so at
    * real scale (thousands of splits) this is the identity and no
    * shuffle is ever added; locally it moves the sub-MB table once.
    * Pushed filters and column pruning still reach the scan — Catalyst
    * pushes both through Repartition. */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  /** Deterministic money integerization: floor(x*100) as long ("cents"). */
  def cents(c: Column): Column = floor(c * 100)

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark reads as a long
    * (spark.sql.legacy.parquet.nanosAsLong=true, set by all our session
    * builders); this converts to a proper timestamp. EXACT integer
    * division: the former `(c / 1000).cast("long")` went through a
    * double, whose ulp at 2024-epoch nanos (~1.7e18) is 256 ns — an
    * event within that window of an hour/day boundary could bucket
    * differently from the oracle's exact truncation. decimal(25,0)/1000
    * is exact to 6 fractional digits and the long cast truncates. */
  def tsFromNanos(c: Column): Column =
    timestamp_micros((c.cast("decimal(25,0)") / lit(1000)).cast("long"))
}
