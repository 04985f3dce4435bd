package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end training-corpus build: documents → per-row gates
  * (quality, language) → near-dup clustering → one surviving
  * representative per cluster → corpus written as parquet partitioned by
  * language, plus the corpus-statistics tables (vocab/df, TF-IDF terms).
  * Prints the funnel counts a pipeline operator watches.
  *
  *   tools/run_verify.sh graft.CorpusDemo /root/testdata/sf0.01 /tmp/corpus-demo
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-corpus-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.engine.Tables.documents(spark, sfDir)
    val total = docs.count()
    val gated = graft.operators.Corpus.gated(docs)
    val nGated = gated.count()
    val corpus = graft.operators.Corpus.corpusFilter(docs)
    val nKept = corpus.count()
    // contamination audit on the kept corpus, via the scale shape
    // (Bloom prefilter + exact verify — identical rows to the broadcast
    // baseline): how many kept docs share 3-gram shingles with the
    // probe/eval range
    val nContam = graft.operators.Corpus.decontaminateBloom(docs)
      .filter(col("n_shared_shingles") >= 3) // a copied span, not one
                                             // coincidental 3-gram
      .join(corpus.select("doc_id"), "doc_id").count()
    // sum() over zero rows is null — an all-filtered corpus still prints
    val absorbedRow = corpus.agg(sum(col("cluster_size"))).collect()(0)
    val nAbsorbed = (if (absorbedRow.isNullAt(0)) 0L else absorbedRow.getLong(0)) - nKept

    corpus.write.mode("overwrite").partitionBy("lang").parquet(s"$outDir/corpus")
    graft.operators.Vocab.vocabDf(docs)
      .write.mode("overwrite").parquet(s"$outDir/vocab")
    graft.operators.Vocab.tfidfTopK(docs)
      .write.mode("overwrite").parquet(s"$outDir/top_terms")
    // loader-facing tail: the kept corpus (joined back to its text) as
    // a split=/shard= JSONL tree in hash order — ready to stream
    graft.operators.Corpus.exportShards(
      corpus.select("doc_id", "lang", "quality")
        .join(docs.select("doc_id", "text"), "doc_id"),
      s"$outDir/shards")
    graft.operators.Dedup.clearShingleCaches()

    println(s"[corpus-demo] documents:        $total")
    println(s"[corpus-demo] passed gates:     $nGated")
    println(s"[corpus-demo] kept (deduped):   $nKept  (+$nAbsorbed near-dups absorbed)")
    println(s"[corpus-demo] eval-contaminated: $nContam of $nKept kept docs (>=3 shared shingles; bloom+exact)")
    println(s"[corpus-demo] corpus partitions: " +
      spark.read.parquet(s"$outDir/corpus").select("lang").distinct()
        .orderBy("lang").collect().map(_.getString(0)).mkString(", "))
    println(s"[corpus-demo] shard tree:       " +
      spark.read.json(s"$outDir/shards").groupBy("split").count()
        .orderBy("split").collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
    println(s"[corpus-demo] output under $outDir: corpus/ vocab/ top_terms/ shards/")
    spark.stop()
  }
}
