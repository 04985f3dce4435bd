package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cosine_similarity is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(v == 1.0)
    val ortho = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(ortho) < 1e-15)
    // length mismatch -> null, not an exception
    val row = spark.sql(
      "SELECT cosine_similarity(array(1.0D), array(1.0D, 2.0D)) AS c").collect().head
    assert(row.isNullAt(0))
  }

  test("expression agrees with the HOF formulation on fixture embeddings") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50).select(col("vec_id"), col("embedding"))
    val paired = emb.crossJoin(emb.select(col("embedding").as("e2")).limit(5))
    val cmp = paired.select(
      Similarity.cosine(col("embedding"), col("e2")).as("expr_cos"),
      (Similarity.dot(col("embedding"), col("e2"))
        / (Similarity.norm(col("embedding")) * Similarity.norm(col("e2")))).as("hof_cos"))
    assert(cmp.filter(abs(col("expr_cos") - col("hof_cos")) > 1e-12).count() == 0)
  }
}
