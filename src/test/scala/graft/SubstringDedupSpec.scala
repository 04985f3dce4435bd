package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SubstringDedup

/** Exact-substring dedup / n-gram decontamination (q76/q78): planted-
  * fixture completeness (every planted span of >= k tokens found at
  * exactly the right offsets and lengths — and nothing else from the
  * fixture), threshold boundaries (k−1 overlaps and sub-k documents
  * emit nothing), multi-span pairs, and the salt-grid equality that
  * makes the skew guard an EXACT decomposition. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtureDf = SubstringDedup.SpanFixture.toDF("doc_id", "text")

  private def spanSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("duplicateSpans finds every planted span — offsets, lengths, triples, multi-span pairs — and nothing else") {
    val got = spanSet(SubstringDedup.duplicateSpans(fixtureDf))
    val expected = Set(
      // the 20-token passage at offsets 6 (A) and 12 (B)
      (4000000L, 4000001L, 6L, 12L, 20L),
      // the 14-token license block shared by C@1, D@4, E@2 — all 3 pairs
      (4000002L, 4000003L, 1L, 4L, 14L),
      (4000002L, 4000004L, 1L, 2L, 14L),
      (4000003L, 4000004L, 4L, 2L, 14L),
      // J holds the passage TWICE (positions 3 and 24): two aligned
      // spans against each single-copy carrier, no self-pair
      (4000000L, 4000009L, 6L, 3L, 20L),
      (4000000L, 4000009L, 6L, 24L, 20L),
      (4000001L, 4000009L, 12L, 3L, 20L),
      (4000001L, 4000009L, 12L, 24L, 20L))
    assert(got == expected,
      s"missing: ${expected -- got}; unexpected: ${got -- expected}")
    // implied boundary cases, stated explicitly: the k-1-token overlap
    // (F/G) and the identical-but-sub-k pair (H/I) emit nothing
    assert(!got.exists(t => Set(t._1, t._2).intersect(
      Set(4000005L, 4000006L, 4000007L, 4000008L)).nonEmpty),
      "below-threshold fixtures leaked into the span output")
  }

  test("a span of exactly k tokens is found; k-1 is not (threshold boundary)") {
    val k = 5
    val exact = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 s5 x3"),
      (2L, "y1 s1 s2 s3 s4 s5 y2 y3 y4")).toDF("doc_id", "text")
    assert(spanSet(SubstringDedup.duplicateSpans(exact, k)) ==
      Set((1L, 2L, 3L, 2L, 5L)))
    val under = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 x3 x4"),
      (2L, "y1 s1 s2 s3 s4 y2 y3 y4")).toDF("doc_id", "text")
    assert(spanSet(SubstringDedup.duplicateSpans(under, k)).isEmpty)
  }

  test("salt-grid decomposition is exact: salted == unsalted on corpus + fixture") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .unionByName(fixtureDf)
    val plain = spanSet(SubstringDedup.duplicateSpans(docs))
    val salted = spanSet(SubstringDedup.duplicateSpans(docs, saltBuckets = 4))
    assert(plain.nonEmpty, "fixture corpus produced no spans at all")
    assert(salted == plain,
      s"salt grid changed the span set: missing ${plain -- salted}, " +
        s"extra ${salted -- plain}")
  }

  test("contaminationSpans: quoted passage located, full copy spanned, k-1 near-miss silent") {
    val train = SubstringDedup.ContaminatedTrainFixture.toDF("doc_id", "text")
    val probe = SubstringDedup.BenchmarkFixture.toDF("doc_id", "text")
    val got = spanSet(SubstringDedup.contaminationSpans(train, probe))
    val expected = Set(
      // T1 quotes bm03..bm12 (10 tokens) at train pos 5, probe pos 3
      (4200000L, 4100000L, 5L, 3L, 10L),
      // T3 carries the full 16-token benchmark at train pos 4
      (4200002L, 4100000L, 4L, 1L, 16L))
    assert(got == expected,
      s"missing: ${expected -- got}; unexpected: ${got -- expected}")
  }
}
