package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed generic warmup: JVM/codegen/parquet-reader init, so the
    // alphabetically-first query doesn't absorb session startup.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // noop sink: forces full computation + materialization of every output
    // column (count() would let Catalyst prune the projections away).
    // A failed query must NOT look like a timing: record -1 as its value
    // and surface the message in an "errors" object, so a broken query
    // can't silently pass the bench surface.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      (name, if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
    }
    graft.operators.Dedup.clearShingleCaches()
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200) + "\""
    val errs = results.collect { case (k, _, Some(m)) => s"\"" + k + "\":" + jstr(m) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
