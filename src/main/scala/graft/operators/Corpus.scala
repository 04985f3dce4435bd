package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextFns._

/** The composed training-corpus pipeline (q38): everything a pretraining
  * data pass actually runs, wired end to end —
  *
  *   documents → per-row features (token count, quality score, language
  *   ID) → quality + language gates → near-dup cluster canonical-keep →
  *   final corpus rows.
  *
  * This is the integration query over the standalone operators
  * ([[TextAnalysis]], [[Dedup]]): each piece is oracle-checked alone;
  * this checks their composition.
  *
  * Scale design (100 TB): the feature+gate stage is ONE narrow pass over
  * the scan (the per-row columns come from shared single-pass builders,
  * not per-feature self-joins). The only shuffles are the ones dedup
  * itself needs (LSH banding + component closure on the tiny duplicate
  * subgraph), plus the final keep-list join, which at scale is a
  * broadcast semi-join: the keep-list carries only (doc_id,
  * cluster_size) for cluster CANONICALS — near-corpus-sized, so it stays
  * a shuffle join on doc_id; the gates have already cut the probe side.
  */
object Corpus {

  val MinQuality = 0.35
  val KeepLangs: Seq[String] = Seq("en", "de")

  /** Final corpus rows: docs passing the quality gate and the language
    * allowlist (on the catalog `lang`; the predicted language rides along
    * for audit) that are the canonical representative of their near-dup
    * cluster. `cluster_size` > 1 marks rows that absorbed duplicates. */
  def corpusFilter(docs: DataFrame, minQuality: Double = MinQuality,
      langs: Seq[String] = KeepLangs): DataFrame = {
    val keep = Dedup.duplicateClusters(docs)
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_size"))
    val feats = docs.select(
      col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars"),
      size(wsTokens(col("text"))).cast("long").as("n_tokens"),
      TextAnalysis.qualityCol.as("quality"),
      TextAnalysis.predLangCol.as("pred_lang"))
      .filter(col("quality") >= minQuality && col("lang").isInCollection(langs))
    feats.join(keep, "doc_id")
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("quality"),
        col("n_tokens"), col("n_chars"), col("cluster_size"))
  }

  /** Streaming twin of the per-row gate stage: the quality/language
    * feature columns are pure per-row expressions, so the SAME builders
    * run unchanged over an unbounded document stream (stateless — no
    * watermark needed). Dedup stages are the batch-side counterpart: at
    * scale the stream gates documents on arrival and a periodic batch
    * pass reconciles near-dup clusters over the accumulated corpus. */
  def gateStream(docs: DataFrame, minQuality: Double = MinQuality,
      langs: Seq[String] = KeepLangs): DataFrame =
    docs.select(
      col("doc_id"), col("lang"),
      TextAnalysis.qualityCol.as("quality"),
      TextAnalysis.predLangCol.as("pred_lang"))
      .filter(col("quality") >= minQuality && col("lang").isInCollection(langs))

  // ---- SparkEntry wiring -------------------------------------------------

  def qCorpusFilter(s: SparkSession, d: String): DataFrame =
    corpusFilter(Tables.documents(s, d)).orderBy("doc_id")

  /** Composed oracle: the q37 closure chain builds the keep-list; the q8 /
    * q9 statements run as subqueries for quality and predicted language.
    * Filters mirror [[corpusFilter]] exactly. */
  val qCorpusFilterSql: String = {
    val langList = KeepLangs.map(l => s"'$l'").mkString(", ")
    s"""WITH RECURSIVE ${Dedup.jaccardCtesSql},
       |${Dedup.clusterCtesSql},
       |keep AS (
       |  SELECT lab.doc_id, sz.cluster_size
       |  FROM lab JOIN sz USING (cluster_id)
       |  WHERE lab.doc_id = lab.cluster_id),
       |qual AS (SELECT doc_id, n_chars, n_tokens, quality
       |         FROM (${TextAnalysis.qQualityScoreSql}) ),
       |pl AS (SELECT doc_id, pred_lang FROM (${TextAnalysis.qLangIdSql}) )
       |SELECT d.doc_id, d.lang, pl.pred_lang, qual.quality,
       |       qual.n_tokens, qual.n_chars, keep.cluster_size
       |FROM documents d
       |JOIN qual USING (doc_id)
       |JOIN pl USING (doc_id)
       |JOIN keep USING (doc_id)
       |WHERE qual.quality >= $MinQuality AND d.lang IN ($langList)
       |ORDER BY d.doc_id""".stripMargin
  }
}
