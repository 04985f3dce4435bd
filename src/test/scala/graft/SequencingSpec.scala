package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sequencing

/** Properties of the two-level sequence packer that the oracle query
  * cannot see: the fixture's doc_ids all fall inside one 65536-wide
  * block, so the cross-block offset path (blk_offset != 0) is only
  * exercised here, with a tiny blockWidth forcing many blocks. */
class SequencingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def packed(blockWidth: Long): Seq[(Long, Long)] =
    Sequencing.packSequences(
        graft.engine.Tables.documents(spark, sf), blockWidth = blockWidth)
      .select(col("doc_id").cast("long"), col("seq_bin").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("packing is blockWidth-invariant (blocked cumsum == global cumsum)") {
    // width 2 → ~n/2 blocks, so nearly every row takes the blk_offset
    // path; width 7 is coprime with the id spacing; 1<<30 ≈ unblocked.
    val reference = packed(1L << 30)
    assert(reference.nonEmpty)
    for (w <- Seq(2L, 7L, 64L)) {
      assert(packed(w) == reference,
        s"blockWidth=$w changed seq_bin assignment")
    }
  }

  test("bins are contiguous from 0 per lang and starts stay under budget") {
    val rows = Sequencing.packSequences(
        graft.engine.Tables.documents(spark, sf), blockWidth = 16L)
      .select("lang", "doc_id", "n_tokens", "seq_bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val ordered = docs.sortBy(_._2)
      // reconstruct the global cumsum and check each doc's bin is the
      // budget-quantized start offset — the packer's defining equation
      var cum = 0L
      ordered.foreach { case (_, id, n, bin) =>
        assert(bin == cum / Sequencing.PackBudget,
          s"$lang doc $id: bin $bin != ${cum / Sequencing.PackBudget}")
        cum += n
      }
      assert(ordered.head._4 == 0L, s"$lang does not start at bin 0")
    }
  }

  test("committed BPE merge table is exactly what the trainer produces") {
    // FixtureMerges is inlined into the q64/q65 oracle SQL, so it must
    // never drift from trainMerges — this re-trains on the same fixture
    // and pins equality (which also pins the trainer's determinism:
    // top-K vocab by (count DESC, word ASC), ties to the smallest pair)
    val trained = graft.operators.Bpe.trainMerges(
      graft.engine.Tables.documents(spark, sf),
      graft.operators.Bpe.FixtureMergeCount)
    assert(trained == graft.operators.Bpe.FixtureMerges)
  }

  test("BPE tokenization is lossless and provably differs from whitespace") {
    val spark0 = spark
    import spark0.implicits._
    // 'stream' -> [st, r, e, a, m] under the fixture table: 2 words but
    // 10 BPE tokens — the budget the whitespace packer gets WRONG
    val df = Seq((1L, "stream batch")).toDF("doc_id", "text")
    val row = df.select(
      graft.operators.Bpe.tokens(col("text")).as("toks"),
      graft.operators.Bpe.tokenCount(col("text")).as("n"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("ws")).head()
    assert(row.getSeq[String](0) == Seq("st", "r", "e", "a", "m", "b", "at", "c", "h"),
      s"got ${row.getSeq[String](0)}")
    assert(row.getLong(1) == 9L && row.getLong(2) == 2L,
      "BPE and whitespace budgets must differ on multi-token words")
    // lossless: tokens concatenate back to the whitespace-joined words
    val docs = graft.engine.Tables.documents(spark, sf)
    val bad = docs.select(
        concat_ws("", graft.operators.Bpe.tokens(col("text"))).as("joined"),
        concat_ws("", split(trim(col("text")), "\\s+")).as("orig"))
      .filter(col("joined") =!= col("orig")).count()
    assert(bad == 0L, "BPE tokens must concatenate back to the input words")
    // and on the real fixture the two budgets actually diverge
    val diverging = docs.filter(
      graft.operators.Bpe.tokenCount(col("text")) =!=
        size(split(trim(col("text")), "\\s+")).cast("long")).count()
    assert(diverging > 0L, "fixture must contain docs where BPE != whitespace")
  }

  test("BPE vocab stats count token instances and doc frequency exactly") {
    val spark0 = spark
    import spark0.implicits._
    // 'stream' -> [st,r,e,a,m], 'batch' -> [b,at,c,h], 'scan' -> [scan]
    val docs = Seq((1L, "stream batch", "en"), (2L, "batch scan scan", "en"))
      .toDF("doc_id", "text", "lang")
    val got = docs
      .select(col("doc_id"), explode(graft.operators.Bpe.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("b") == ((2L, 2L)), s"'b' appears in both docs' 'batch': $got")
    assert(got("scan") == ((2L, 1L)), "'scan' twice in one doc")
    assert(got("st") == ((1L, 1L)))
    assert(got.values.map(_._1).sum == 5L + 4L + 4L + 1L + 1L,
      "instance counts must cover every emitted token")
  }

  test("BPE OOV/non-ASCII contract: code-point base tokens, OOV falls through") {
    // THE CONTRACT (BpeCore.charTokens): a word's initial tokens are
    // Unicode CODE POINTS — a non-BMP character (emoji) enters as ONE
    // token, never two lone surrogates — and characters outside the
    // trained alphabet find no merge, so they fall through as
    // single-code-point tokens while trained merges keep applying to
    // the ASCII substrings around them. Driver-gated end to end by
    // q72's oracle; named here on hand-picked words.
    val spark0 = spark
    import spark0.implicits._
    def toksOf(text: String): Seq[String] =
      Seq((1L, text)).toDF("doc_id", "text")
        .select(graft.operators.Bpe.tokens(col("text"))).head().getSeq[String](0)
    // CJK: fully OOV -> one token per code point
    assert(toksOf("数据") == Seq("数", "据"))
    // non-BMP emoji: U+1F680 is a surrogate PAIR in UTF-16 — must stay
    // one token (a code-unit iterator would emit two lone surrogates)
    assert(toksOf("🚀🚀") == Seq("🚀", "🚀"))
    assert(toksOf("🚀🚀").forall(t => t.codePointCount(0, t.length) == 1))
    // mixed word: the trained merges (e,r)->er, (o,r)->or, (s,o...)
    // still fire around the untrained 'ä' — 'Wärter' keeps ä single
    val w = toksOf("Wärter")
    assert(w.contains("ä") && w.contains("er") && w.mkString == "Wärter",
      s"got $w")
    // trained-alphabet behavior is unchanged by the contract
    assert(toksOf("sort") == Seq("sort"))
  }

  test("packing plan does not force a broadcast of the offsets relation") {
    // a broadcast() HINT would OOM on sparse/hashed doc_ids where the
    // per-block aggregate degrades to corpus size; AQE may still CHOOSE
    // broadcast at runtime (fine) — assert the logical plan is unhinted
    val logical = Sequencing.packSequences(
      graft.engine.Tables.documents(spark, sf)).queryExecution.logical.toString
    assert(!logical.toLowerCase.contains("unresolvedhint") &&
      !logical.contains("ResolvedHint"),
      s"offsets join carries a broadcast hint:\n$logical")
  }
}
