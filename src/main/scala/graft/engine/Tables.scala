package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access. All SparkEntry queries read the driver-generated
  * parquet star schema (TESTDATA.md): one file per table under `sfDir`.
  *
  * At 100 TB these reads become catalog-table scans (`spark.table`) over
  * Hive-partitioned parquet; the query code below is unchanged because
  * everything downstream is plan-level (Catalyst prunes columns + pushes
  * filters into the scan either way).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across fixture generations:
    * INT64 TIMESTAMP(NANOS) (read as long via nanosAsLong, truncated to
    * micros — what DuckDB's micro-precision TIMESTAMP does on the same
    * file) vs plain timestamp[us] (arrives as TIMESTAMP_NTZ; pass through).
    * Branch on the loaded dtype so either generation reads identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // normalize to session-tz TIMESTAMP (all entry points pin UTC) so
        // downstream epoch arithmetic (`cast(ts as bigint)`) keeps working
        // and values match the nanos-era behavior exactly
        df.withColumn("ts", df("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet dtype $other (expected INT64 nanos or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
