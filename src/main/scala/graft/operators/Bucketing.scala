package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed tables for shuffle-free co-located joins — the 100 TB answer
  * to repeated fact⋈fact joins on the same key (builder-prompt scale
  * technique; no analog in the reference, which joins only post-aggregation
  * relations).
  *
  * Writing both sides bucketed by the join key into the warehouse means
  * every future equi-join on that key is planned WITHOUT an Exchange on
  * either side (verified in BucketingSpec by asserting the physical plan
  * has zero shuffles): at 100 TB that converts the dominant repeated cost
  * — re-shuffling a fact table per query — into a one-time layout cost at
  * write. `sortWithinPartitions` additionally enables sort-merge without
  * per-task sorting.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Bucket lineitem + orders by orderkey and join co-located. Returns the
    * joined per-order rollup. The plan for the join has NO Exchange. */
  def colocatedOrderJoin(spark: SparkSession, sfDir: String,
      buckets: Int = 8): DataFrame = {
    graft.engine.Tables.lineitem(spark, sfDir)
      .createOrReplaceTempView("li_src")
    graft.engine.Tables.orders(spark, sfDir)
      .createOrReplaceTempView("o_src")
    writeBucketed(spark.table("li_src"), "li_bucketed", "l_orderkey", buckets)
    writeBucketed(spark.table("o_src"), "o_bucketed", "o_orderkey", buckets)
    spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
  }
}
