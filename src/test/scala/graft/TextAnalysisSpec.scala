package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.functions.TextFns

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs = Seq(
    (1L, "the quick brown fox and the lazy dog"),
    (2L, "Hello, world! How are you??"),
    (3L, "el perro que corre por los campos"),
  ).toDF("doc_id", "text")

  test("token stats: whitespace vs regex tokenization") {
    val out = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((8L, 7L, 8L)))          // 8 ws tokens, 7 distinct ("the" x2)
    // "Hello, world! How are you??" -> ws: 5; regex: 5 words + 4 punct = 9
    assert(out(2L)._1 == 5L && out(2L)._3 == 9L)
  }

  /** Adversarial tokenization edges for the fused TextProfile pass: the
    * composable form's Spark-split semantics keep leading/trailing empty
    * segments for non-space whitespace (SQL trim strips 0x20 only), the
    * empty string tokenizes to [""], and non-ASCII codepoints count as
    * punct/re_tokens. */
  def edgeDocs = Seq(
    (10L, ""), (11L, "   "), (12L, "\t"), (13L, "\ta b\n"),
    (14L, "a  b   c"), (15L, " the  THE the "), (16L, "the and of is with"),
    (17L, "el los una por que der und das"), (18L, "??!!.."),
    (19L, "café naïve résumé"), (20L, "a1b2 3c4d !x! 9"),
    (21L, "line1\nline2\r\nline3"), (22L, "The Quick BROWN fox"),
  ).toDF("doc_id", "text")

  test("fused TextProfile == composable formulations (edge docs + corpus)") {
    val corpus = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    for (d <- Seq(edgeDocs, corpus)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(rows(TextAnalysis.tokenStats(d)) == rows(TextAnalysis.tokenStatsComposable(d)),
        "tokenStats")
      // zero-length text divides by zero in punct_ratio under ANSI mode —
      // in the fused AND composable form alike (semantics preserved);
      // the corpus has no empty docs, so compare on the non-empty ones.
      val dq = d.filter(length($"text") > 0)
      assert(rows(TextAnalysis.qualityScore(dq)) == rows(TextAnalysis.qualityScoreComposable(dq)),
        "qualityScore")
      assert(rows(TextAnalysis.langId(d)) == rows(TextAnalysis.langIdComposable(d)),
        "langId")
    }
  }

  test("fused TextProfile matches composable under a tr-locale JVM") {
    // UTF8String.toLowerCase lowercases a string containing ANY
    // non-ASCII char via default-locale String.toLowerCase — under tr,
    // "IS" inside such a text becomes "ıs" (dotless ı), NOT a marker
    // hit. The fused pass must take the same whole-text branch, or
    // lang-id results would depend on the JVM locale differently per
    // path. Locale flipped and restored around the assert; suites run
    // sequentially in this build, so no concurrent test observes it.
    val prior = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      val d = Seq(
        (1L, "café IS THE el los"),     // non-ASCII text: tr rules apply
        (2L, "plain IS THE el los"),    // all-ASCII text: locale-free path
      ).toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(rows(TextAnalysis.langId(d)) == rows(TextAnalysis.langIdComposable(d)),
        "fused and composable lang-id must agree under a tr default locale")
    } finally java.util.Locale.setDefault(prior)
  }

  test("quality score components in range") {
    val rows = TextAnalysis.qualityScore(docs).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1, "punct_ratio")
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1, "stopword_ratio")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1, "quality")
    }
    val q = rows.map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(q(1L) > q(2L), "clean stopword-rich text scores above punct-heavy")
  }

  test("lang id picks marker-matching language deterministically") {
    val out = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(out(1L) == "en")
    assert(out(3L) == "es")
  }

  test("fingerprint is whitespace/punct/case-insensitive") {
    val d = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD?"),
      (4L, "goodbye world"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprintGroups(d).collect()
    assert(out.length == 2)
    val grp = out.find(_.getLong(2) == 3L).get
    assert(grp.getLong(1) == 1L) // canonical doc_id of the hello-world group
  }

  test("shingles: 3-word grams with short-doc fallback") {
    val d = Seq((1L, "a b c d"), (2L, "only two")).toDF("doc_id", "text")
    val sh = d.select(col("doc_id"), TextFns.shingles(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L) == Seq("only two"))
  }

  test("vocab df/tf totals are exact on a hand corpus") {
    val d = Seq(
      (1L, "spark joins spark"),
      (2L, "joins scale"),
      (3L, "solo"),
    ).toDF("doc_id", "text")
    val v = graft.operators.Vocab.vocabDf(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("spark") == ((2L, 1L)))  // tf 2, in 1 doc
    assert(v("joins") == ((2L, 2L)))  // tf 2, in 2 docs
    assert(v("scale") == ((1L, 1L)) && v("solo") == ((1L, 1L)))
  }

  test("tfidf ranks rare terms above common ones") {
    val d = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common third"),
    ).toDF("doc_id", "text")
    val top = graft.operators.Vocab.tfidfTopK(d, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" appears in every doc -> idf ln(1)=0; the doc-unique term wins
    assert(top(1L) == "rare" && top(2L) == "other" && top(3L) == "third")
  }

  test("bigrams: adjacent pairs only, single-token docs contribute none") {
    val d = Seq((1L, "a b c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val bg = graft.operators.Vocab.topBigrams(d, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bg == Map("a b" -> 2L, "b c" -> 1L))
  }

  test("sequence packing: bins fill to the budget, oversized docs isolate") {
    val d = Seq(
      (1L, "en", ("w " * 300).trim),  // 300 tokens
      (2L, "en", ("w " * 300).trim),  // still bin 0 (cum-n=300 < 512)
      (3L, "en", ("w " * 300).trim),  // bin 1 (cum-n=600)
      (4L, "en", ("w " * 900).trim),  // oversized: bin 1 (cum-n=900)
      (5L, "de", ("w " * 10).trim),   // separate shard: bin 0
    ).toDF("doc_id", "lang", "text")
    val out = graft.operators.Sequencing.packSequences(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("token chunking: stride starts, truncated tail, full coverage") {
    val d = Seq((1L, ("t " * 100).trim)).toDF("doc_id", "text") // 100 tokens
    val out = graft.operators.Sequencing.chunkTokens(d).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // starts 0, 48, 96 -> lens 64, 52, 4
    assert(out == Map(0L -> 64L, 1L -> 52L, 2L -> 4L))
  }

  test("repetition ratio flags degenerate text, passes varied text") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"), // 1 distinct / 8
      (2L, "every single word in this sentence appears exactly once"),
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.repetition(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L)._2 && out(1L)._1 > 0.8)
    assert(!out(2L)._2 && out(2L)._1 == 0.0)
  }

  test("decontamination finds planted probe overlap and only that") {
    val d = Seq(
      (1L, "the secret benchmark answer is forty two exactly"),      // probe
      (30L, "model output copied the secret benchmark answer is forty two"), // contaminated
      (31L, "an entirely clean training document with original words"),
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus.decontaminate(d, probeMaxId = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(30L) && out(30L) >= 3) // shared 3-grams of the copied span
    assert(!out.contains(31L))
  }

  test("bloom-prefiltered decontamination == broadcast path; filter in plan") {
    import graft.operators.Corpus
    val corpus = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val bloomed = Corpus.decontaminateBloom(corpus)
    assert(rows(bloomed) == rows(Corpus.decontaminate(corpus)),
      "bloom path must be row-identical (false positives die in the exact join)")
    // the prefilter must actually be in the physical plan, train-side
    assert(bloomed.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"), "prefilter missing from plan")
    // an all-clean corpus: empty result, no crash on the 0-probe edge
    val clean = Seq((100L, "completely original text here today")).toDF("doc_id", "text")
    assert(Corpus.decontaminateBloom(clean, probeMaxId = 20).count() == 0)
  }

  test("near-dup decontamination: planted leak shapes, verify filter, broadcast probe") {
    import graft.operators.Corpus
    // fixture-only corpus: the three train shapes against the two probes
    val probe = Corpus.NeardupProbeFixture.toDF("doc_id", "text")
    val train = Corpus.NeardupTrainFixture.toDF("doc_id", "text")
    val out = Corpus.neardupDecontaminate(train, probe)
    val rows = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // exact copy: j = 1.0 against its source benchmark
    assert(rows(4400000L) == ((1L, 4300000L, 1.0)))
    // light edit: 27 of 29 distinct shingles shared = 0.931034 at 6dp —
    // a paraphrase-shaped leak exact decon (q48 whole-shingle counting
    // flags it too, but substring q78 would see only the shared run)
    assert(rows(4400001L) == ((1L, 4300000L, 0.931034)))
    // sub-tau overlap (j = 6/43): never flagged, whether or not a band
    // happens to collide — the verify filter is the contract
    assert(!rows.contains(4400002L))
    assert(rows.size == 2)
    // the probe side rides a broadcast: the train corpus never shuffles
    // into the band join
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "probe bands must broadcast")
    // tau is a real lever: at tau above the edit's jaccard only the
    // exact copy survives
    val strict = Corpus.neardupDecontaminate(train, probe, tau = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(4400000L))
  }

  test("NFC normalize: semantics, codegen plan, null safety") {
    import graft.functions.NormalizeFns.nfcNormalize
    val df = Seq(
      (1L, "café"),              // decomposed -> precomposed
      (2L, "caf\u00e9"),           // already NFC
      (3L, "가"),            // jamo -> syllable U+AC00
      (4L, "á̧x"),          // reorder + blocked-composition case
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), nfcNormalize(col("text")).as("n"))
    val out = df.collect().map(r => r.getLong(0) ->
      Option(r.getString(1))).toMap
    assert(out(1L) == Some("caf\u00e9"))
    assert(out(2L) == Some("caf\u00e9"))
    assert(out(3L) == Some("\uac00"))
    // canonical reorder puts cedilla(202) first, then the acute — NOT
    // blocked by the lower-ccc cedilla — composes with the starter
    assert(out(4L) == Some("\u00e1\u0327x"))
    assert(out(5L).isEmpty, "null must propagate")
    // idempotence: normalizing the normalized column is a fixpoint
    val twice = Seq(("café")).toDF("text")
      .select(nfcNormalize(nfcNormalize(col("text"))).as("n")).head().getString(0)
    assert(twice == "caf\u00e9")
    // the expression implements doGenCode: over a real scan (a local
    // Seq constant-folds into LocalTableScan before planning) the
    // projection stays inside a WholeStageCodegen span — no fallback
    // eval bridge
    val scan = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(nfcNormalize(col("text")).as("n"))
    val plan = scan.queryExecution.executedPlan.toString
    // the `*(N)` marker on the Project IS the WholeStageCodegen span in
    // executedPlan.toString; a fallback expression would print an
    // unstarred Project
    assert(plan.contains("*(1) Project [unicodenormalize"),
      s"nfc projection fell out of whole-stage codegen:\n$plan")
    assert(scan.count() > 0)
  }

  test("NFKC casefold: declared fixture folds, idempotence, codegen, null safety") {
    import graft.functions.NormalizeFns.nfkcCasefold
    // the q89 fixture's DECLARED expectations, engine side: every row
    // must fold to exactly its declaration (ligature, fullwidth, roman
    // numeral, unit square, ß-survives, singleton+lower, compose+lower,
    // dotted-I decomposition)
    val fx = graft.operators.TextAnalysis.CasefoldFixture
    val got = fx.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
      .select(col("doc_id"), nfkcCasefold(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fx.foreach { case (id, raw, expected) =>
      assert(got(id) == expected,
        s"fixture $id: '$raw' folded to '${got(id)}', declared '$expected'")
    }
    // null propagates; the fold is idempotent (a fixpoint)
    val df2 = Seq(("ﬁLE x"), (null.asInstanceOf[String])).toDF("text")
      .select(nfkcCasefold(col("text")).as("one"),
        nfkcCasefold(nfkcCasefold(col("text"))).as("two"))
    val rows2 = df2.collect()
    assert(rows2.exists(r => r.getString(0) == "file x"
      && r.getString(1) == "file x"))
    assert(rows2.exists(r => r.isNullAt(0) && r.isNullAt(1)),
      "null must propagate")
    // doGenCode with the form parameter: still inside WholeStageCodegen
    val scan = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(nfkcCasefold(col("text")).as("f"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [unicodenormalize"),
      s"nfkc-casefold projection fell out of whole-stage codegen:\n$plan")
    assert(scan.count() > 0)
    // r19 advice: casefold must re-normalize to the REQUESTED form, not
    // a hardcoded NFC — NFKD+casefold of É (U+00C9) must come back as
    // the DECOMPOSED e + U+0301, where the old NFC constant recomposed
    // to é (composed output from a decomposed-form request)
    import org.apache.spark.sql.graftbridge.Bridge
    val nfkdFold = Bridge.column(graft.functions.UnicodeNormalize(
      Bridge.expression(col("text")), "NFKD", casefold = true))
    val folded = Seq("Élan").toDF("text")
      .select(nfkdFold.as("f")).head().getString(0)
    assert(folded.take(2) == "é",
      s"NFKD+casefold must return decomposed output, got ${folded.toList}")
    assert(java.text.Normalizer.isNormalized(folded,
      java.text.Normalizer.Form.NFKD), "output must be NFKD-normalized")
  }

  test("quality classifier: labels/split deterministic, model clears gates, broken model flips red") {
    import graft.operators.QualityModel
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val lab = QualityModel.labeled(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // terciles: both classes present, middle band excluded
      val byLabel = lab.groupBy("weak_label").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byLabel.keySet == Set(0L, 1L) && byLabel.values.forall(_ > 0))
      assert(lab.count() < docs.count(), "the middle tercile must be unlabeled")
      // the real fit clears both gates WITH MARGIN — the margin itself
      // is the contract (floor + 0.04; measured 0.9530 vs the 0.90
      // floor at this scale): erosion fails HERE, deterministically,
      // before it could surface as an intermittent bench hash failure
      // (fit agreement is not bit-deterministic — treeAggregate float
      // reduction order — but varies at float-summation scale, orders
      // of magnitude inside this margin)
      val (agree, majority) = QualityModel.fitAndEval(lab)
      assert(agree >= QualityModel.AgreementFloor + 0.04,
        s"agreement $agree eroded the floor+margin contract " +
          s"(floor ${QualityModel.AgreementFloor})")
      assert(agree > majority, s"agreement $agree <= majority $majority")
      // a silently inverted model (train labels flipped, holdout intact —
      // the lockstep-tuning failure shape) must flip model_pass red
      val sabotaged = lab.withColumn("weak_label",
        when(col("split") === "train", lit(1L) - col("weak_label"))
          .otherwise(col("weak_label")))
      val (agreeBad, _) = QualityModel.fitAndEval(sabotaged)
      assert(agreeBad < QualityModel.AgreementFloor,
        s"inverted fit still read $agreeBad — the floor gates nothing")
      // q95: the model-rate budget gate — honest fit lands the mean
      // per-source |model - weak| budget delta inside the margin (the
      // oracle pins it TRUE), the same inverted fit flips it red
      val honest = graft.operators.Corpus
        .modelBudgetGateFrom(docs, lab, graft.operators.Corpus.QualityMixBase)
        .collect()
      assert(honest.nonEmpty &&
        honest.forall(_.getAs[Boolean]("budget_within_bound")),
        "honest fit must clear the budget bound")
      val flipped = graft.operators.Corpus
        .modelBudgetGateFrom(docs, sabotaged,
          graft.operators.Corpus.QualityMixBase)
        .collect()
      assert(flipped.forall(r => !r.getAs[Boolean]("budget_within_bound")),
        "train-inverted fit must breach the budget bound")
      // the oracle-replayable weak side is identical under both fits —
      // only the gate moves
      def weakSide(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(weakSide(honest) == weakSide(flipped))
    } finally { lab.unpersist(); () }
  }

  test("corpus mixing gates the big source to the uniform share, keeps minima whole") {
    // skewed mixture: one 8-doc crawl vs two 3-doc sources -> m = 3
    val d = ((1L to 8L).map(i => (i, "web")) ++
      (101L to 103L).map(i => (i, "books")) ++
      (201L to 203L).map(i => (i, "code"))).toDF("doc_id", "source")
    val kept = graft.operators.Corpus.mixCorpus(d).collect()
      .map(r => r.getLong(0)).toSet
    // minimum-count sources hit threshold 1e6: every row survives
    assert((101L to 103L).forall(kept) && (201L to 203L).forall(kept))
    // the big source is gated at exactly 3*1e6 div 8 = 375000 of hash
    // space — recompute the portable 60-bit hash here and demand the
    // EXACT kept set (value-hashed gate: no RNG, no order dependence)
    def h60(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var h = 0L
      (0 until 7).foreach(i => h = (h << 8) | (dig(i) & 0xffL))
      (h << 4) | ((dig(7) & 0xf0L) >> 4)
    }
    val expectedWeb = (1L to 8L).filter(i => h60(i.toString) % 1000000L < 375000L).toSet
    assert(kept.filter(_ < 100L) == expectedWeb, s"kept=$kept")
    // deterministic: a second run returns the identical set
    assert(graft.operators.Corpus.mixCorpus(d).collect()
      .map(_.getLong(0)).toSet == kept)
  }

  test("weighted corpus mixing follows the recipe and drops unlisted sources") {
    val d = ((1L to 8L).map(i => (i, "web")) ++
      (101L to 103L).map(i => (i, "books")) ++
      (201L to 203L).map(i => (i, "code"))).toDF("doc_id", "source")
    // 2 parts web : 1 part books; code not in the recipe -> dropped.
    // u = min(8 div 2, 3 div 1) = 3 -> web thresh 3*2*1e6 div 8 = 750000,
    // books thresh 3*1e6 div 3 = 1e6 (kept whole)
    val kept = graft.operators.Corpus
      .mixCorpus(d, parts = Map("web" -> 2L, "books" -> 1L))
      .collect().map(r => r.getLong(0)).toSet
    assert(!kept.exists(_ >= 200L), "unlisted source must be dropped")
    assert((101L to 103L).forall(kept), "1-part source under budget keeps all")
    def h60(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var h = 0L
      (0 until 7).foreach(i => h = (h << 8) | (dig(i) & 0xffL))
      (h << 4) | ((dig(7) & 0xf0L) >> 4)
    }
    val expectedWeb = (1L to 8L).filter(i => h60(i.toString) % 1000000L < 750000L).toSet
    assert(kept.filter(_ < 100L) == expectedWeb, s"kept=$kept")
  }

  test("quality-weighted mix: degrading one source's quality shifts its budget away") {
    // two sources of equal size: "good" docs are long, low-punct,
    // stopword-rich (top tercile); "junk" docs are short punct bursts
    // (bottom tercile). The weak-label pass rates then split 1.0 / 0.0,
    // so the junk source's budget collapses to zero while good keeps
    // the full base — and the admitted mix contains no junk rows.
    def goodText(i: Long) =
      (1 to 60).map(j => if (j % 3 == 0) "the" else s"word$i$j").mkString(" ")
    val good = (1L to 10L).map(i => (i, "good", goodText(i)))
    val junk = (101L to 110L).map(i => (i, "junk", "!!! ??? ###"))
    val d = (good ++ junk).toDF("doc_id", "source", "text")
    val budgets = graft.operators.Corpus
      .sourceQualityBudgets(d, base = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(budgets("good") == 1000L,
      s"all-top-tercile source must keep the full base: $budgets")
    assert(budgets("junk") == 0L,
      s"all-bottom-tercile source must zero out: $budgets")
    val mixed = graft.operators.Corpus.qualityWeightedMix(d, 1000L)
      .collect().map(_.getLong(0)).toSet
    assert(mixed.nonEmpty && mixed.forall(_ <= 10L),
      s"zero-budget source leaked into the mix: $mixed")
    // the shift is RELATIVE, not just degenerate: swap half the junk
    // source's docs to good text and its budget lands strictly between
    val dHalf = (good ++ junk.take(5) ++
      (106L to 110L).map(i => (i, "junk", goodText(i)))).toDF(
      "doc_id", "source", "text")
    val bHalf = graft.operators.Corpus
      .sourceQualityBudgets(dHalf, base = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bHalf("junk") > 0L && bHalf("junk") < bHalf("good"),
      s"half-degraded source should sit strictly between: $bHalf")
  }

  test("infeasible mixing recipe fails loudly instead of returning an empty mix") {
    // books has 3 rows but owes 4 parts -> 3 div 4 = 0 achievable units;
    // the old behavior zeroed every threshold and silently emitted an
    // empty corpus
    val d = ((1L to 8L).map(i => (i, "web")) ++
      (101L to 103L).map(i => (i, "books"))).toDF("doc_id", "source")
    val e = intercept[Exception] {
      graft.operators.Corpus
        .mixCorpus(d, parts = Map("web" -> 1L, "books" -> 4L)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("mixCorpus") && m.contains("books")),
      s"expected the undersized source named in: ${messages(e)}")
  }

  test("folded dedup: byte-distinct case/width/ligature variants share one key; raw-byte dedup would not merge them") {
    import org.apache.spark.sql.functions.{col, md5}
    import graft.functions.NormalizeFns.nfkcCasefold
    val fx = graft.operators.TextAnalysis.FoldedDedupFixture
      .map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val folded = fx
      .groupBy(md5(nfkcCasefold(col("text"))).as("k"))
      .agg(org.apache.spark.sql.functions.min("doc_id").as("keep"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions
          .lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // the trio rolls up to 4700000 (n=3), the pair to 4700010 (n=2),
    // the singleton stands alone
    assert(folded == Map(4700000L -> 3L, 4700010L -> 2L, 4700020L -> 1L),
      s"folded rollup diverged: $folded")
    // the hazard q92 closes: the RAW key (q11's) sees six unrelated docs
    val raw = fx.groupBy(md5(col("text"))).count().count()
    assert(raw == 6L, s"raw-byte keys unexpectedly merged: $raw groups")
  }

  test("cluster-safe split: no near-dup cluster straddles a split boundary; doc-keyed split provably would") {
    import org.apache.spark.sql.functions.col
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Corpus.clusterSafeSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // the defining invariant: every cluster maps to exactly one split
    val byCluster = out.groupBy(_._2).map { case (c, rs) =>
      c -> rs.map(_._3).distinct }
    assert(byCluster.values.forall(_.size == 1),
      s"clusters straddling splits: ${byCluster.filter(_._2.size > 1).keys}")
    // all three splits are populated and cover every doc
    assert(out.map(_._3).distinct.toSet == Set("train", "val", "test"))
    assert(out.length == docs.count())
    // the hazard is REAL on this corpus: at least one multi-doc cluster
    // contains docs whose DOC-keyed nibbles land in different splits —
    // the leak shuffleShard would commit and this operator prevents
    def docSplit(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString.substring(0, 1)
      if (h == "c" || h == "d") "val"
      else if (h == "e" || h == "f") "test" else "train"
    }
    val wouldLeak = out.groupBy(_._2).exists { case (_, rs) =>
      rs.length > 1 && rs.map(r => docSplit(r._1)).distinct.length > 1
    }
    assert(wouldLeak,
      "fixture corpus has no cluster that a doc-keyed split would tear " +
        "— the spec lost its discriminating case")
  }

  test("shuffleShard: deterministic hash split/shard, full cover, no shuffle") {
    import org.apache.spark.sql.functions.col
    val docs = (0L until 2000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = graft.operators.Corpus.shuffleShard(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // full cover, exactly once, stable across runs (content-independent)
    assert(out.map(_._1).toSet == (0L until 2000L).toSet && out.length == 2000)
    val again = graft.operators.Corpus.shuffleShard(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // stability under growth: adding docs never moves an existing one
    val grown = graft.operators.Corpus
      .shuffleShard(docs.union(Seq((9999L, "new")).toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(grown.filter(_._1 < 2000L).sortBy(_._1).toSeq ==
      out.sortBy(_._1).toSeq)
    // split proportions ~12/2/2 sixteenths of an md5 nibble; loose bounds
    val bySplit = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit("train") > 1300 && bySplit("train") < 1700, s"$bySplit")
    assert(bySplit("val") > 150 && bySplit("val") < 350, s"$bySplit")
    assert(bySplit("test") > 150 && bySplit("test") < 350, s"$bySplit")
    // shard uniformity: 16 shards, none starved or dominant
    val byShard = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byShard.keySet == (0L until 16L).toSet, s"$byShard")
    assert(byShard.values.min > 60 && byShard.values.max < 250, s"$byShard")
    // scale shape: one narrow projection — no Exchange, no Window, no Sort
    val plan = graft.operators.Corpus.shuffleShard(docs)
      .queryExecution.executedPlan.toString
    Seq("Exchange", "Window", "Sort").foreach(op =>
      assert(!plan.contains(op), s"shuffleShard plan contains $op:\n$plan"))
  }

  test("exportShards: sharded JSONL tree, hash-ordered files, lossless round-trip") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = (0L until 500L).map(i => (i, s"doc text $i")).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    graft.operators.Corpus.exportShards(docs.repartition(7), out)
    // partition tree: split=*/shard=* dirs only
    val splits = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(splits == Set("split=train", "split=val", "split=test"), s"$splits")
    // round-trip: every row back exactly once, under its assigned dirs
    val back = spark.read.json(out)
    assert(back.count() == 500 &&
      back.select("doc_id").distinct().count() == 500)
    val assign = graft.operators.Corpus.shuffleShard(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    back.select(col("doc_id"), col("split"), col("shard").cast("long"))
      .collect().foreach { r =>
        assert(assign(r.getLong(0)) == (r.getString(1), r.getLong(2)),
          s"doc ${r.getLong(0)} landed in the wrong shard dir")
      }
    // within ONE file, rows are in md5-hash order (the loader contract)
    val aFile = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(out), Array("json"), true)
      .iterator().next()
    val inFile = spark.read.json(aFile.getPath)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hx"))
      .collect().map(r => r.getString(1))
    assert(inFile.sameElements(inFile.sorted),
      "rows within a shard file are not in hash order")
    // and the export pipeline itself plans with NO exchange: project +
    // in-partition sort only — the corpus is never repartitioned onto
    // the tiny (split, shard) key on its way to the files
    val shaped = graft.operators.Corpus.shardWritePlanFor(docs)
    assert(!shaped.queryExecution.executedPlan.toString.contains("Exchange"),
      s"export pipeline shuffles:\n${shaped.queryExecution.executedPlan}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("tokenBudgetMix: hash-prefix fill, boundary overflow, blocked == plain window") {
    import graft.operators.Corpus
    import org.apache.spark.sql.expressions.Window
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.01")
    val budget = 400L
    val got = Corpus.tokenBudgetMix(docs, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    // reference: the PLAIN per-source window over the same hash order —
    // the blocked two-level formulation must equal it row for row (the
    // packSequences invariance argument on hash-prefix blocks)
    val plain = docs.select(col("doc_id"), col("source"),
        size(graft.functions.TextFns.wsTokens(col("text"))).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("hx"))
      .withColumn("cum_before",
        sum(col("n_tokens")).over(Window.partitionBy(col("source"))
          .orderBy(col("hx"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("n_tokens"))
      .filter(col("cum_before") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == plain.toSet,
      s"blocked fill diverged from the plain window: ${got.length} vs ${plain.length}")
    // budget semantics per source: admitted tokens reach the budget
    // (boundary doc overflows) OR the source is wholly admitted
    val totals = docs.groupBy("source")
      .agg(sum(size(graft.functions.TextFns.wsTokens(col("text")))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._2).foreach { case (src, rows) =>
      val admitted = rows.map(_._3).sum
      assert(admitted >= math.min(budget, totals(src)),
        s"$src under-filled: $admitted of budget $budget (total ${totals(src)})")
      // removing the hash-LAST admitted doc must drop below budget —
      // i.e. the fill is minimal, not just sufficient
      if (rows.length > 1 && admitted > budget) {
        val hx = rows.map { case (id, _, n) =>
          (java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes).map("%02x".format(_)).mkString, n)
        }.sortBy(_._1)
        assert(admitted - hx.last._2 < budget,
          s"$src admitted a doc past the filled budget")
      }
    }
  }

  test("PII scrub: exact counts, full redaction, order hazards pinned") {
    import graft.operators.Pii
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      // every original class twice, interleaved
      (1L, "a@b.co then 1.2.3.4 then 111-22-3333 then 555-123-4567 " +
        "and again x@y.org 10.0.0.1 444-55-6666 555.987.6543"),
      // ORDER HAZARD 1: the email's local part IS an SSN-shaped digit
      // run at a word boundary — the SSN class matches it on the
      // original text, but email-first redaction must absorb the whole
      // address (ssn-first would emit "<SSN>@files.example.com")
      (2L, "123-45-6789@files.example.com wrote in"),
      // ORDER HAZARD 2: placeholders are digit-free — redacting the IP
      // between two digit runs must not create a phone/SSN match
      (3L, "ids 555 1.2.3.4 123-4567 stay un-merged"),
      // boundary: no internal word boundary inside a digit run, so a
      // dotted build number is NOT an address; pin that no class fires
      (4L, "version 123.456.7890123 is just a long build number"),
      (5L, "clean text"),
      (6L, ""),
      // range-checked octets: out-of-range values neither count nor
      // redact (the audit-fidelity fix)
      (7L, "999.999.999.999 and 256.1.2.3 and 1.2.3.256 pass through"),
      // PANs: dashed + spaced Luhn-valid test numbers, one bare-digit
      // valid PAN, one shape-only run failing the checksum
      (8L, "4111-1111-1111-1111 4012 8888 8888 1881 4532015112830366 " +
        "and bad 1234-5678-9012-3456"),
      // a 17-digit run has no internal boundary: not a PAN
      (9L, "serial 12345678901234567 stays"),
      // IPv6 forms: full, compressed, loopback, trailing ::
      (10L, "fe80::1 and 2001:0db8:85a3:0000:0000:8a2e:0370:7334 " +
        "and ::1 and 2001:db8:: done"),
      // scope-operator hazard: bare :: (and ::<non-hex>) never matches
      (11L, "std::string s; std::vector::iterator it"),
      // the DOCUMENTED over-match (RE2 has no lookbehind): a hex-SPELLED
      // identifier after :: reads as a compressed address; 'hex' itself
      // ('x' is not a hex digit) does not
      (13L, "stream << std::dec << x; std::hex is fine though"),
      // IPv4-mapped IPv6: the ipv4-first order redacts the dotted tail,
      // then the hex head reads as a (now tail-less) compressed form
      (12L, "mapped ::ffff:192.168.0.1 routes")).toDF("doc_id", "text")
    val cols = Pii.scrub(docs).columns
    val out = Pii.scrub(docs).collect().map { r =>
      r.getLong(0) -> ((c: String) => r.get(cols.indexOf(c)))
    }.toMap
    def n(id: Long, c: String): Long = out(id)(s"n_$c").asInstanceOf[Long]
    def red(id: Long): String = out(id)("text_redacted").asInstanceOf[String]
    assert(Seq("email", "ssn", "phone", "ipv4").forall(n(1L, _) == 2),
      s"doc1 counts")
    assert(red(1L) == "<EMAIL> then <IP> then <SSN> then <PHONE> " +
      "and again <EMAIL> <IP> <SSN> <PHONE>", s"doc1: ${red(1L)}")
    // hazard 1: the whole address redacts as ONE email — a reordered
    // pattern list would emit "<SSN>@files.example.com" and fail here.
    // Counts on the ORIGINAL text DO see the embedded ssn shape (audit
    // counts are per-class independent of redaction order).
    assert(n(2L, "email") == 1 && n(2L, "ssn") == 1 &&
      red(2L) == "<EMAIL> wrote in", s"doc2")
    // hazard 2: nothing merges across the digit-free placeholder
    assert(red(3L) == "ids 555 <IP> 123-4567 stay un-merged",
      s"doc3: ${red(3L)}")
    assert(n(4L, "ipv4") == 0 && red(4L).contains("123.456.7890123"),
      s"doc4")
    Seq(5L, 6L).foreach { id =>
      assert(Pii.patterns.forall { case (c, _, _) => n(id, c) == 0 } &&
        n(id, "cc_luhn") == 0, s"doc$id not clean")
    }
    assert(red(5L) == "clean text" && red(6L) == "")
    // tightened ipv4: invalid octets are invisible to count AND redact
    assert(n(7L, "ipv4") == 0 &&
      red(7L).contains("999.999.999.999") && red(7L).contains("256.1.2.3"),
      s"doc7: ${red(7L)}")
    // PAN shape vs Luhn: 4 shapes, 3 checksum-valid
    assert(n(8L, "cc") == 4 && n(8L, "cc_luhn") == 3, s"doc8: cc=${n(8L, "cc")}" +
      s" luhn=${n(8L, "cc_luhn")}")
    assert(red(8L) == "<CC> <CC> <CC> and bad <CC>", s"doc8: ${red(8L)}")
    assert(n(9L, "cc") == 0 && red(9L).contains("12345678901234567"), "doc9")
    // IPv6: all four forms counted and redacted
    assert(n(10L, "ipv6") == 4, s"doc10: ${n(10L, "ipv6")}")
    assert(red(10L) == "<IPV6> and <IPV6> and <IPV6> and <IPV6> done",
      s"doc10: ${red(10L)}")
    assert(n(11L, "ipv6") == 0 && red(11L) == "std::string s; " +
      "std::vector::iterator it", s"doc11: ${red(11L)}")
    assert(n(12L, "ipv4") == 1 && n(12L, "ipv6") == 1 &&
      red(12L) == "mapped <IPV6>:<IP> routes", s"doc12: ${red(12L)}")
    assert(n(13L, "ipv6") == 1 &&
      red(13L) == "stream << std<IPV6> << x; std::hex is fine though",
      s"doc13 (documented ::dec over-match): ${red(13L)}")
  }

  test("Luhn expression: checksum ground truth, separators, degenerate input") {
    import graft.operators.Pii
    val spark0 = spark
    import spark0.implicits._
    // JVM-side reference implementation of the checksum
    def luhnRef(s: String): Boolean = {
      val ds = s.filter(_.isDigit).map(_ - '0')
      ds.nonEmpty && ds.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    }
    val cases = Seq("4111111111111111", "4111-1111-1111-1111",
      "4012 8888 8888 1881", "4532015112830366", "1234567890123456",
      "79927398713", "79927398710", "0000000000000000", "", "no digits")
    val got = cases.toDF("pan")
      .select(col("pan"), Pii.luhnValid(col("pan")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { c =>
      assert(got(c) == luhnRef(c), s"luhn('$c'): got ${got(c)}")
    }
    // sanity against known ground truth, not just the reference impl
    assert(got("4111111111111111") && got("79927398713") &&
      !got("79927398710") && !got("1234567890123456") && !got(""))
  }
}
