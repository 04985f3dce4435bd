package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for every SparkEntry query
  * (or the ones named in args) so scan pruning (ReadSchema/PushedFilters),
  * broadcast joins, and WholeStageCodegen spans can be inspected.
  *
  *   tools/run_verify.sh graft.Explain q3_arrest_pct_topk q26_shipping_priority
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n================ $name ================")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
