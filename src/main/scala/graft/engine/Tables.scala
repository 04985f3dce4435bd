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
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark 4
    * rejects by default; read nanos as long and truncate to micros —
    * exactly what DuckDB's micro-precision TIMESTAMP does on the same
    * file, so both engines see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
