package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pin the loud-failure contract of Verify (ADVICE r11): a query that
  * throws must produce a red row in errors.json, not a silent omission. */
class VerifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a throwing query lands in errors.json; survivors still write parquet") {
    val out = Files.createTempDirectory("graft-verify").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok_query"   -> ((s, _) => { import s.implicits._; Seq((1, "a")).toDF("id", "v") }),
      "boom_query" -> ((_, _) => throw new RuntimeException("injected failure")))
    val errors = Verify.run(spark, "/unused", out, queries,
      Map("ok_query" -> "SELECT 1 AS id, 'a' AS v"))
    assert(errors.keySet == Set("boom_query"))
    assert(errors("boom_query").contains("injected failure"))
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errJson.contains("boom_query") && errJson.contains("injected failure"))
    assert(Files.exists(Paths.get(s"$out/ok_query")))
    assert(!Files.exists(Paths.get(s"$out/boom_query")))
    assert(spark.read.parquet(s"$out/ok_query").count() == 1)
  }

  test("a clean run writes an empty errors.json (presence is the signal)") {
    val out = Files.createTempDirectory("graft-verify-clean").toString
    val errors = Verify.run(spark, "/unused", out,
      Map("ok" -> ((s: SparkSession, _: String) => { import s.implicits._; Seq(1).toDF("x") })),
      Map("ok" -> "SELECT 1 AS x"))
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/errors.json")).trim == "{}")
  }
}
