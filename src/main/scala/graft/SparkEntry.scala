package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a §7/8 scale
  * extension) exercised on the driver's star schema; `oracleSql` holds the
  * equivalent DuckDB SQL over the same parquet tables. Column names and
  * dtypes are aligned between both sides (the driver's compare sorts
  * columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.arrestPctTopk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_count_by_type"  -> (StarQueries.countByType _),
    "q2_violent_filter" -> (StarQueries.violentFilter _),
    "q3_arrest_pct_topk" -> (StarQueries.arrestPctTopk _),
    "q4_fixed_dates"    -> (StarQueries.fixedDates _),
    "q5_partition_derive" -> (StarQueries.partitionDerive _),
    "q6_topk_window"    -> (StarQueries.topkWindow _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_count_by_type"  -> StarQueries.countByTypeSql,
    "q2_violent_filter" -> StarQueries.violentFilterSql,
    "q3_arrest_pct_topk" -> StarQueries.arrestPctTopkSql,
    "q4_fixed_dates"    -> StarQueries.fixedDatesSql,
    "q5_partition_derive" -> StarQueries.partitionDeriveSql,
    "q6_topk_window"    -> StarQueries.topkWindowSql,
  )
}
