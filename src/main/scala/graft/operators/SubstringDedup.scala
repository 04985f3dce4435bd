package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextFns

/** Exact-substring (shared-passage) dedup and n-gram-overlap
  * decontamination — the substring-granularity family the document-level
  * dedups (exact hash q11, MinHash/LSH q13, SimHash q36, embeddings q58)
  * cannot see (builder-prompt scale extension; the reference has no text
  * surface). A 100-TB corpus's worst duplication is substring-level:
  * license headers, boilerplate, and quoted passages shared across
  * otherwise-distinct documents. The public approach (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better") finds
  * duplicate token runs of at least k tokens (k=50 there; scaled down
  * here to the fixture's ~55-token documents); eval-set contamination is
  * likewise caught by 8–13-token n-gram overlap against the benchmark,
  * not whole-document equality.
  *
  * Execution shape — bucketed shuffle, NEVER all-pairs documents:
  *
  *   1. WINDOWS: one narrow pass emits every overlapping k-token window
  *      per document as (doc_id, pos, md5(window)) — O(tokens) rows,
  *      inside whole-stage codegen, no shuffle. Documents shorter than
  *      k tokens emit nothing (they cannot contain a k-token span).
  *   2. MATCH: an equi self-join on the window hash — only window VALUES
  *      that actually collide pay join work, the substring analog of the
  *      LSH band join. The key is the full 128-bit md5, not [[TextFns
  *      .hash60]]: at 100 TB the corpus holds ~10^10 windows, where a
  *      60-bit key expects birthday collisions (≈2^30 keys) and every
  *      collision would fabricate a false span; 2^64-birthday headroom
  *      is the correctness margin, for 2× key width. A hot window value
  *      (boilerplate shared by millions of docs) is the same hot-key
  *      hazard as a hot LSH band: `saltBuckets > 1` engages
  *      [[Skew.saltGridSides]] for an EXACT blocked decomposition
  *      (row-set-identical, spec-pinned), and AQE skew-join splitting
  *      covers the moderate cases by default.
  *   3. SPANS: matched windows merge into MAXIMAL aligned runs with the
  *      islands trick — within a (doc_a, doc_b, pos_a − pos_b) group,
  *      consecutive pos_a values share one island id (pos_a −
  *      row_number), and each island is one span of k + windows − 1
  *      tokens. The window partition key is per-document-pair — high
  *      cardinality, bounded by document length, no tiny-key funnel.
  *
  * Every stage is deterministic and engine-portable (md5 + integer
  * arithmetic), so the DuckDB oracle replays windows, matches, and
  * island merges bit-for-bit — q76/q78 hash-pin the whole kernel.
  */
object SubstringDedup {

  /** Default minimum duplicate-span length in tokens for the dedup
    * surface — the fixture-scaled analog of the public k≈50 (documents
    * here average ~55 tokens where real corpora run thousands; q76's
    * organic output at k=12 is the planted near-dup structure's shared
    * prefixes, 24 spans at sf0.01). */
  val DedupK = 12

  /** Default n-gram length for decontamination — the public 8–13-gram
    * range's low end: contamination flags on the SHORTEST run worth
    * flagging, and the oracle pins the exact-span semantics either
    * way. */
  val ContaminationK = 8

  /** Overlapping k-token windows of every document: (doc_id, pos, wh)
    * with pos 1-based and wh = md5 of the space-joined window. One
    * narrow projection + explode — no shuffle. */
  private[operators] def windowRel(docs: DataFrame, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"window length must be >= 2 tokens, got $k")
    val w = TextFns.wsTokens(col("text"))
    docs.select(col(idCol).as("doc_id"), w.as("w"))
      .where(size(col("w")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - lit(k - 1)),
        i => struct(i.cast("long").as("pos"),
          md5(concat_ws(" ", slice(col("w"), i, lit(k)))).as("wh"))))
        .as("win"))
      .select(col("doc_id"), col("win.pos").as("pos"), col("win.wh").as("wh"))
  }

  /** Merge matched windows (doc_a, doc_b, pos_a, pos_b) into maximal
    * aligned spans: (doc_a, doc_b, a_start, b_start, span_tokens). */
  private def islandsToSpans(matched: DataFrame, k: Int,
      aCol: String, bCol: String, aStart: String,
      bStart: String): DataFrame = {
    val byDiff = Window.partitionBy(col(aCol), col(bCol), col("diff"))
      .orderBy(col("pos_a"))
    matched
      .withColumn("diff", col("pos_a") - col("pos_b"))
      .withColumn("island",
        col("pos_a") - row_number().over(byDiff).cast("long"))
      .groupBy(col(aCol), col(bCol), col("diff"), col("island"))
      .agg(min(col("pos_a")).as(aStart), min(col("pos_b")).as(bStart),
        count(lit(1)).as("nwin"))
      .select(col(aCol), col(bCol), col(aStart), col(bStart),
        (col("nwin") + lit(k - 1)).cast("long").as("span_tokens"))
  }

  /** All maximal cross-document duplicate spans of >= k tokens within
    * `docs` (unordered pairs, doc_a < doc_b). `saltBuckets > 1` engages
    * the exact salt-grid decomposition of the window-hash self-join for
    * hot boilerplate windows (row-set-identical — spec-pinned). */
  def duplicateSpans(docs: DataFrame, k: Int = DedupK,
      saltBuckets: Int = 1): DataFrame = {
    val wins = windowRel(docs, k)
    val salted = saltBuckets > 1
    val (lSide, rSide) =
      if (salted) Skew.saltGridSides(wins, "doc_id", saltBuckets)
      else (wins, wins)
    val cellKeys = if (salted) Seq("__cell_lo", "__cell_hi") else Nil
    val l = lSide.select((Seq("wh") ++ cellKeys).map(col) ++
      Seq(col("doc_id").as("da"), col("pos").as("pa")): _*)
    val r = rSide.select((Seq("wh") ++ cellKeys).map(col) ++
      Seq(col("doc_id").as("db"), col("pos").as("pb")): _*)
    val joined = l.join(r, Seq("wh") ++ cellKeys)
    // grid cells orient cross-block pairs by salt, not id (see
    // lshCandidatePairs): canonicalize id AND position together, then
    // drop the diagonal cells' duplicated orientation. The unsalted
    // path's a<b predicate needs neither.
    val matched =
      if (salted) joined.filter(col("da") =!= col("db"))
        .select(
          when(col("da") < col("db"), col("da")).otherwise(col("db")).as("doc_a"),
          when(col("da") < col("db"), col("db")).otherwise(col("da")).as("doc_b"),
          when(col("da") < col("db"), col("pa")).otherwise(col("pb")).as("pos_a"),
          when(col("da") < col("db"), col("pb")).otherwise(col("pa")).as("pos_b"))
        .distinct()
      else joined.filter(col("da") < col("db"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("pa").as("pos_a"), col("pb").as("pos_b"))
    islandsToSpans(matched, k, "doc_a", "doc_b", "a_start", "b_start")
  }

  /** All maximal shared runs of >= k tokens between a TRAIN corpus and a
    * benchmark PROBE set — n-gram-overlap decontamination, the
    * substring-granularity generalization of [[Corpus.decontaminate]]
    * (which counts shared shingles per train doc): this names WHERE the
    * contamination sits and HOW LONG it runs, the evidence an eval-set
    * audit wants. The probe side is benchmark-sized (tiny next to the
    * corpus), so its window relation broadcasts and the train corpus is
    * never shuffled — one scan, one broadcast hash join. */
  def contaminationSpans(train: DataFrame, probe: DataFrame,
      k: Int = ContaminationK): DataFrame = {
    val tw = windowRel(train, k)
    val pw = windowRel(probe, k)
    val matched = tw
      .join(broadcast(pw.select(col("doc_id").as("probe_doc"),
        col("pos").as("pos_b"), col("wh"))), Seq("wh"))
      .select(col("doc_id").as("train_doc"), col("probe_doc"),
        col("pos").as("pos_a"), col("pos_b"))
    islandsToSpans(matched, k, "train_doc", "probe_doc",
      "train_start", "probe_start")
  }

  // ---- SparkEntry wiring -------------------------------------------------

  /** Planted shared-passage fixture under ids disjoint from the corpus
    * (vocabulary disjoint too, so fixture windows can only match each
    * other): an aligned 20-token passage at DIFFERENT offsets in two
    * docs; a 14-token license block shared by three docs (all three
    * pairs must emerge); a k−1-token overlap that must NOT emit; a pair
    * of identical sub-k documents (no windows at all); and a doc holding
    * the passage TWICE (two distinct aligned spans against each carrier,
    * and no self-pair). */
  val SpanFixture: Seq[(Long, String)] = {
    val p20 = (1 to 20).map(i => f"zz$i%02d").mkString(" ")
    val l14 = (1 to 14).map(i => f"ll$i%02d").mkString(" ")
    val n11 = (1 to 11).map(i => f"nn$i%02d").mkString(" ")
    Seq(
      (4000000L, s"la1 la2 la3 la4 la5 $p20 ta1 ta2 ta3"),
      (4000001L, s"lb01 lb02 lb03 lb04 lb05 lb06 lb07 lb08 lb09 lb10 lb11 " +
        s"$p20 tb1 tb2"),
      (4000002L, s"$l14 tc1 tc2 tc3 tc4 tc5 tc6 tc7 tc8"),
      (4000003L, s"ld1 ld2 ld3 $l14 td1 td2 td3"),
      (4000004L, s"le1 $l14 te1 te2 te3 te4"),
      // exactly k-1 = 11 shared tokens: below the span threshold
      (4000005L, s"$n11 fa1 fa2 fa3 fa4"),
      (4000006L, s"ga1 ga2 ga3 ga4 ga5 $n11"),
      // identical but shorter than k: no windows, no span
      (4000007L, "hh1 hh2 hh3 hh4 hh5 hh6 hh7 hh8"),
      (4000008L, "hh1 hh2 hh3 hh4 hh5 hh6 hh7 hh8"),
      // the passage twice: two aligned spans vs each carrier
      (4000009L, s"j1 j2 $p20 jm $p20 j3"))
  }

  /** Benchmark + contaminated-train fixture for q78 (ids disjoint from
    * corpus and from [[SpanFixture]]): one train doc quoting a 10-token
    * benchmark passage mid-document, one full-copy carrier, and a
    * k−1-token near-miss that must NOT flag. */
  val BenchmarkFixture: Seq[(Long, String)] = {
    val bm16 = (1 to 16).map(i => f"bm$i%02d").mkString(" ")
    val bq12 = (1 to 12).map(i => f"bq$i%02d").mkString(" ")
    Seq((4100000L, bm16), (4100001L, bq12))
  }

  val ContaminatedTrainFixture: Seq[(Long, String)] = {
    val quote10 = (3 to 12).map(i => f"bm$i%02d").mkString(" ")
    val bm16 = (1 to 16).map(i => f"bm$i%02d").mkString(" ")
    val near7 = (1 to 7).map(i => f"bq$i%02d").mkString(" ")
    Seq(
      (4200000L, s"wa1 wa2 wa3 wa4 $quote10 wb1 wb2 wb3"),
      (4200001L, s"wc1 wc2 $near7 wd1 wd2 wd3 wd4 wd5"),
      (4200002L, s"we1 we2 we3 $bm16 wf1"))
  }

  private def fixtureValues(fx: Seq[(Long, String)]): String =
    fx.map { case (id, t) => s"($id, '${t.replace("'", "''")}')" }
      .mkString(", ")

  private def fixtureDf(s: SparkSession, fx: Seq[(Long, String)]): DataFrame = {
    import s.implicits._
    fx.toDF("doc_id", "text")
  }

  /** q76: maximal duplicate spans (>= [[DedupK]] tokens) over corpus ∪
    * planted fixture. The organic rows are the planted near-dup
    * structure's shared prefixes; the fixture pins offsets, triples,
    * the k−1 near-miss, and multi-span pairs. */
  def qSubstringDedup(s: SparkSession, d: String): DataFrame =
    duplicateSpans(
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(fixtureDf(s, SpanFixture)), DedupK)
      .orderBy("doc_a", "doc_b", "a_start", "b_start")

  /** Oracle fragment: the window relation `<p>wins(doc_id, pos, wh)` of
    * source CTE `src` — the [[windowRel]] replay. DuckDB's `range()`
    * table function cannot take lateral column bounds, so positions come
    * from `unnest(range(...))` in a projection. */
  private def windowCtesSql(srcCte: String, k: Int, p: String): String =
    s"""${p}toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
       |          FROM $srcCte),
       |${p}posn AS (SELECT doc_id, w, unnest(range(1, len(w) - $k + 2)) AS pos
       |         FROM ${p}toks WHERE len(w) >= $k),
       |${p}wins AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |                md5(array_to_string(list_slice(w, pos, pos + $k - 1), ' ')) AS wh
       |         FROM ${p}posn)""".stripMargin

  /** Oracle fragment: matched windows → islands → maximal spans. */
  private def islandsSql(k: Int, aSide: String, bSide: String,
      joinPred: String, aCol: String, bCol: String, aStart: String,
      bStart: String): String =
    s"""m AS (SELECT a.doc_id AS $aCol, b.doc_id AS $bCol,
       |             a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diff
       |      FROM $aSide a JOIN $bSide b ON a.wh = b.wh AND $joinPred),
       |isl AS (SELECT *, pos_a - ROW_NUMBER() OVER (
       |          PARTITION BY $aCol, $bCol, diff ORDER BY pos_a) AS island
       |        FROM m)
       |SELECT $aCol, $bCol, MIN(pos_a) AS $aStart, MIN(pos_b) AS $bStart,
       |       CAST(COUNT(*) + $k - 1 AS BIGINT) AS span_tokens
       |FROM isl GROUP BY $aCol, $bCol, diff, island""".stripMargin

  val qSubstringDedupSql: String =
    s"""WITH src AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT * FROM (VALUES ${fixtureValues(SpanFixture)})
       |    fx(doc_id, text)),
       |${windowCtesSql("src", DedupK, "")},
       |${islandsSql(DedupK, "wins", "wins", "a.doc_id < b.doc_id",
         "doc_a", "doc_b", "a_start", "b_start")}
       |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin

  /** q78: contamination spans (>= [[ContaminationK]] tokens) of the
    * train side (organic docs >= 20 ∪ planted contaminated trains)
    * against the benchmark probe set (organic docs < 20 ∪ planted
    * benchmarks) — [[Corpus.decontaminate]]'s probe/train split, at
    * substring granularity. */
  def qNgramContamination(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") >= Corpus.DefaultProbeMaxId)
      .unionByName(fixtureDf(s, ContaminatedTrainFixture))
    val probe = docs.filter(col("doc_id") < Corpus.DefaultProbeMaxId)
      .unionByName(fixtureDf(s, BenchmarkFixture))
    contaminationSpans(train, probe, ContaminationK)
      .orderBy("train_doc", "probe_doc", "train_start", "probe_start")
  }

  val qNgramContaminationSql: String =
    s"""WITH src AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id >= ${Corpus.DefaultProbeMaxId}
       |  UNION ALL SELECT * FROM (VALUES ${fixtureValues(ContaminatedTrainFixture)})
       |    fx(doc_id, text)),
       |psrc AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < ${Corpus.DefaultProbeMaxId}
       |  UNION ALL SELECT * FROM (VALUES ${fixtureValues(BenchmarkFixture)})
       |    pfx(doc_id, text)),
       |${windowCtesSql("src", ContaminationK, "t")},
       |${windowCtesSql("psrc", ContaminationK, "p")},
       |${islandsSql(ContaminationK, "twins", "pwins", "TRUE",
         "train_doc", "probe_doc", "train_start", "probe_start")}
       |ORDER BY train_doc, probe_doc, train_start, probe_start""".stripMargin
}
