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
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
