package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextFns._

/** Sequence-shaping operators — the step between a cleaned corpus and a
  * training batch:
  *
  *  - [[packSequences]] (q46): assign documents to fixed-token-budget
  *    bins ("sequence packing") by running token count, per language
  *    shard. Packing is inherently sequential, so the distributed form
  *    packs WITHIN a shard (here `lang`; at 100 TB any shard key that
  *    bounds a partition): one window cumsum per shard, no global order.
  *  - [[chunkTokens]] (q47): split each document into overlapping
  *    fixed-size token windows (context-window chunking for embedding /
  *    pretraining) — a narrow explode, scan-speed, the text analog of
  *    [[Multimodal.sampleFrames]].
  */
object Sequencing {

  val PackBudget = 512   // tokens per packed sequence bin
  val ChunkSize = 64     // tokens per chunk
  val ChunkStride = 48   // tokens between chunk starts (16-token overlap)

  /** (doc_id, lang, n_tokens, seq_bin): documents assigned to
    * consecutive bins per language shard, in doc_id order (the arrival
    * order a streaming packer would see). seq_bin is the budget-
    * quantized START offset of the document in the shard's token
    * stream — so bins hold ~`budget` tokens of starts, and an
    * oversized document overflows the bin containing its start rather
    * than claiming one alone. Split oversized documents FIRST with
    * [[chunkTokens]] when strict per-bin token bounds matter. */
  def packSequences(docs: DataFrame, budget: Int = PackBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("lang"),
      size(wsTokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("seq_bin"))
  }

  /** (doc_id, chunk_id, chunk_len, chunk_hash): overlapping token
    * windows of `size` tokens every `stride` tokens. The hash stands in
    * for the chunk text in the compact output; windows short of `size`
    * at the document tail are kept (truncated slice). */
  def chunkTokens(docs: DataFrame, size: Int = ChunkSize,
      stride: Int = ChunkStride): DataFrame =
    docs
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, greatest(size(split(trim(text), '\\\\s+')) - 1, 0), $stride),
           |  s -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), s + 1, $size)))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        expr("cast(size(split(col, '\\\\s+')) as bigint)").as("chunk_len"),
        md5(col("col")).as("chunk_hash"))

  // ---- SparkEntry wiring -------------------------------------------------

  def qPackSequences(s: SparkSession, d: String): DataFrame =
    packSequences(Tables.documents(s, d)).orderBy("doc_id")

  val qPackSequencesSql: String =
    s"""SELECT doc_id, lang,
       |       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |       ((SUM(len(regexp_split_to_array(trim(text), '\\s+')))
       |           OVER (PARTITION BY lang ORDER BY doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         - len(regexp_split_to_array(trim(text), '\\s+'))) // $PackBudget)::BIGINT AS seq_bin
       |FROM documents ORDER BY doc_id""".stripMargin

  def qChunkTokens(s: SparkSession, d: String): DataFrame =
    chunkTokens(Tables.documents(s, d)).orderBy("doc_id", "chunk_id")

  val qChunkTokensSql: String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents),
       |c AS (
       |  SELECT doc_id, unnest(range(0, greatest(len(toks) - 1, 0) + 1, $ChunkStride)) AS s,
       |         toks
       |  FROM t)
       |SELECT doc_id,
       |       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_id,
       |       CAST(len(list_slice(toks, (s + 1)::INT, (s + $ChunkSize)::INT)) AS BIGINT) AS chunk_len,
       |       md5(array_to_string(list_slice(toks, (s + 1)::INT, (s + $ChunkSize)::INT), ' ')) AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
}
