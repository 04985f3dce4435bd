package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

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

  test("all native expressions are SQL-callable and agree with DataFrame path") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over it")).toDF("doc_id", "text")
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT shingle_set(text) AS sh, minhash_signature(text) AS sig FROM ext_docs")
      .collect().head
    val viaDf = Seq((1L, "the quick brown fox jumps over it")).toDF("doc_id", "text")
      .select(graft.functions.MinHashFns.shingleSet($"text").as("sh"),
        graft.functions.MinHashFns.minhashSignature($"text").as("sig"))
      .collect().head
    assert(viaSql.getSeq[String](0) == viaDf.getSeq[String](0))
    assert(viaSql.getSeq[Long](1) == viaDf.getSeq[Long](1))
    val dp = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dp == 11.0)
  }

  test("simhash and text_profile are SQL-callable and agree with DataFrame path") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox and the lazy dog"),
      (2L, "Hello, world! el los una")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash(text) AS sh,
        |       text_profile(text).ws_tokens AS wt,
        |       text_profile(text).hits_es AS es FROM ext_docs2
        |ORDER BY doc_id""".stripMargin).collect()
    // the SQL surface fixes the 60-bit pair-banding width (Dedup.SimBits)
    val viaDf = docs.select($"doc_id",
      graft.functions.SimHashFns.simhash($"text", Dedup.SimBits).as("sh"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.getLong(1)).toSeq == viaDf.map(_.getLong(1)).toSeq)
    assert(viaSql.map(r => (r.getLong(2), r.getLong(3))).toSeq == Seq((8L, 0L), (5L, 3L)))
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

  test("pure-SQL minhash dedup pipeline via registered functions") {
    // a SQL-only user of the library: signatures -> LSH bands ->
    // candidate pairs without touching the DataFrame API, equal to the
    // DataFrame path's q13 result
    GraftExtensions.register(spark)
    graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("sqldocs")
    val rows = Dedup.NumHashes / Dedup.NumBands
    val viaSql = spark.sql(
      s"""WITH sig AS (SELECT doc_id, minhash_signature(text) AS sig FROM sqldocs),
         |bands AS (
         |  SELECT doc_id, b.pos AS band,
         |         md5(concat_ws(',', transform(slice(sig, b.pos * $rows + 1, $rows),
         |                                      x -> cast(x as string)))) AS band_hash
         |  FROM sig LATERAL VIEW posexplode(sequence(1, ${Dedup.NumBands})) b)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDf = Dedup.lshCandidatePairs(
      graft.engine.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }
}
