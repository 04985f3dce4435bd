package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Persisted dedup state between daily batches — the production shape of
  * incremental near-duplicate clustering. Everything needed to admit a new
  * batch WITHOUT touching old document text lives in four relations a real
  * deployment would keep as tables next to the corpus:
  *
  *  - `labels`   (doc_id, cluster_id)        — current component labeling
  *  - `sizes`    (cluster_id, cluster_size)  — maintained incrementally
  *  - `bands`    (doc_id, band, band_hash)   — the LSH index, persisted
  *                                             bucketed on (band, band_hash)
  *  - `shingles` (doc_id, sh)                — shingle sets for the exact
  *                                             Jaccard verify stage,
  *                                             persisted bucketed on doc_id
  *
  * When the state comes from a bucketed store ([[graft.streaming.DedupStream
  * .loadState]]), `buckets` carries the layout's bucket count and the
  * `bands`/`shingles` relations carry a `bucket` partition column;
  * [[admitBatch]] then prunes both probes to the buckets the batch can
  * touch ([[prunedBands]]/[[prunedShingles]]) instead of scanning all
  * accumulated state; each probe falls back to a plain full scan when
  * its keys cover every bucket (an all-bucket filter reduces nothing —
  * at deployment batch-to-corpus ratios coverage is always partial).
  * An in-memory state (e.g. [[initialState]]) has `buckets = None` and
  * is probed unpruned.
  *
  * The reference's defining semantic is incremental processing — Glue job
  * bookmarks (`CDK/cdk/cdk_stack.py:165`) and the daily delta fetch
  * (`Additional_Data_Function/get_data_api.py:11-13`) re-process only new
  * arrivals. [[Dedup.duplicateClusters]] is the batch (bootstrap) path;
  * this operator is its daily-delta twin.
  */
final case class DedupState(labels: DataFrame, sizes: DataFrame,
                            bands: DataFrame, shingles: DataFrame,
                            buckets: Option[Int] = None)

/** Incremental duplicate clustering: admit a new day's batch against
  * persisted cluster labels without re-running the fixpoint over the whole
  * corpus.
  *
  * Why this is safe (incremental ≡ batch): the old labeling is exactly a
  * contracted representation of the old near-dup graph — every old doc is
  * connected to its component minimum. Components of
  * (old-label edges ∪ new edges) therefore equal components of
  * (old edges ∪ new edges), i.e. a full recompute over the grown corpus.
  * q51's oracle is that statement: the incremental Spark result is
  * hash-compared against a DuckDB recursive-CTE closure, and equals what
  * [[Dedup.duplicateClusters]] would produce from scratch (asserted in
  * IncrementalDedupSpec).
  *
  * Scale design (100 TB corpus, ~0.1% daily batch):
  *  - the ONLY per-corpus-sized work is (a) the band-index lookup — a join
  *    of the new batch's bands against the stored index, bucketed on
  *    (band, band_hash) so it's a pruned bucket probe, not a scan of old
  *    text (old text is never an input at all — structurally enforced:
  *    `admitBatch` does not take the old corpus); (b) the label remap —
  *    a map-side broadcast join of the frontier-sized remap table against
  *    `labels` (a table of two longs per doc, ~10⁻⁴ of corpus bytes; with
  *    a Delta/Iceberg-style store this becomes a merge-on-write of only
  *    remapped cluster ids).
  *  - the component fixpoint runs on the CONTRACTED frontier graph only:
  *    nodes are new doc ids plus the old cluster representatives the new
  *    edges touch — O(batch), not O(corpus).
  *  - `sizes` is updated without a corpus-sized shuffle: untouched rows
  *    pass through a broadcast anti join (map-side, no exchange); only the
  *    frontier-sized touched set re-aggregates.
  */
object IncrementalDedup {

  /** Bucket of a band-index row — the persisted layout key for `bands`.
    * Any state row joinable with a batch row shares (band, band_hash), so
    * it shares this bucket: filtering the stored index to the batch's
    * buckets before the probe join loses no candidate. */
  def bandBucket(band: Column, bandHash: Column, n: Int): Column =
    pmod(xxhash64(band, bandHash), lit(n.toLong)).cast("int")

  /** Bucket of a shingle-set row — the persisted layout key for
    * `shingles` (verify-stage lookups are by doc_id). */
  def docBucket(docId: Column, n: Int): Column =
    pmod(xxhash64(docId), lit(n.toLong)).cast("int")

  private def dropBucket(df: DataFrame): DataFrame =
    if (df.columns.contains("bucket")) df.drop("bucket") else df

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * DataFrame. Checkpoint blocks are NOT CacheManager entries, so
    * `df.unpersist()` would miss them; without this a long-running
    * admission stream accumulates per-batch candidate checkpoints until
    * the ContextCleaner happens to GC the RDDs. */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Band buckets the batch's own (band, band_hash) keys hash into —
    * defined only when the state is bucketed AND the keys cover a STRICT
    * subset of the layout's buckets; full coverage returns None (an
    * all-bucket filter cannot reduce the read, so the probe scans
    * plainly). At deployment ratios (daily batch ≪ corpus / buckets)
    * coverage is partial and the pruned probe wins — the bench's probe
    * A/B measures a 4-doc admit against the grown state both ways. The
    * collect itself is O(batch) work returning at most `buckets` ints
    * (a layout constant), the same K-bounded driver-side index material
    * the ANN operators keep. */
  private def touchedBandBuckets(state: DedupState,
      newBands: DataFrame): Option[Seq[Int]] = state.buckets match {
    case Some(n) if state.bands.columns.contains("bucket") =>
      val touched = newBands
        .select(bandBucket(col("band"), col("band_hash"), n).as("bucket"))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (touched.size < n) Some(touched) else None
    case _ => None
  }

  private def bandsForTouched(state: DedupState,
      touched: Option[Seq[Int]]): DataFrame = touched match {
    case Some(t) if t.isEmpty => state.bands.filter(lit(false)).drop("bucket")
    case Some(t) => state.bands.filter(col("bucket").isin(t: _*)).drop("bucket")
    case None => dropBucket(state.bands)
  }

  /** The band-index probe side: the stored index restricted to the
    * batch's touched buckets — a partition-pruned scan — when that
    * strictly reduces the read; the full index otherwise. */
  private[graft] def prunedBands(state: DedupState,
      newBands: DataFrame): DataFrame =
    bandsForTouched(state, touchedBandBuckets(state, newBands))

  /** The verify-stage shingle side: when the state is bucketed, restrict
    * the stored shingle sets (the LARGEST state relation — text-sized
    * arrays) to the buckets holding a candidate endpoint; the full
    * relation when the endpoints cover every bucket (same
    * cannot-reduce-the-read argument as [[touchedBandBuckets]]). `cand`
    * must be materialized (the caller localCheckpoints it) so collecting
    * its endpoint buckets doesn't re-run the band probe. */
  private[graft] def prunedShingles(state: DedupState,
      cand: DataFrame): DataFrame = state.buckets match {
    case Some(n) if state.shingles.columns.contains("bucket") =>
      val touched = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .select(docBucket(col("d"), n).as("bucket"))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) state.shingles.filter(lit(false)).drop("bucket")
      else if (touched.size < n)
        state.shingles.filter(col("bucket").isin(touched: _*)).drop("bucket")
      else dropBucket(state.shingles)
    case _ => dropBucket(state.shingles)
  }

  /** Bootstrap: full batch clustering + the persisted index relations.
    * This is the day-0 cost a deployment pays once; every later day pays
    * [[admitBatch]] instead. */
  def initialState(docs: DataFrame, threshold: Double = 0.5): DedupState = {
    val lab = Dedup.duplicateClusters(docs, threshold)
    DedupState(
      labels = lab.select(col("doc_id"), col("cluster_id")),
      sizes = lab.select(col("cluster_id"), col("cluster_size")).distinct(),
      bands = Dedup.lshBands(docs),
      shingles = Dedup.shingleSets(docs))
  }

  /** Admit `newDocs` (the new day's drop) into `state`. Returns the updated
    * state; old document TEXT is never read (it isn't an input). New edges
    * may merge existing clusters — a new doc bridging two old clusters
    * relabels the higher-labeled one via the remap join.
    *
    * PRECONDITION: `newDocs.doc_id` must be NEW ids (disjoint from the
    * ids already in `state.labels`) — a re-delivered id would enter
    * `labels` twice and over-count its cluster's size. This is the
    * delivery-dedup contract the file bookmark upstream provides
    * ([[graft.streaming.DedupStream.admitNewDrops]] processes each drop
    * exactly once); content-duplicate re-fetches under FRESH ids are
    * fine — that is precisely the near-dup case this operator clusters. */
  def admitBatch(state: DedupState, newDocs: DataFrame,
                 threshold: Double = 0.5): DedupState = {
    val newBands = Dedup.lshBands(newDocs)
    val newShingles = Dedup.shingleSets(newDocs)
    // the band probe prunes under strict-subset coverage (see
    // touchedBandBuckets); the verify path below prunes independently by
    // candidate-endpoint coverage whenever the state is bucketed
    val bucketed =
      state.buckets.isDefined && state.shingles.columns.contains("bucket")
    val allBands =
      bandsForTouched(state, touchedBandBuckets(state, newBands))
        .union(newBands)

    // candidate pairs touching the new batch: probe the band index with
    // the batch's bands. least/greatest canonicalizes the new-new pairs
    // that appear from both sides of the self-overlapping probe.
    val candLazy = newBands
      .select(col("band"), col("band_hash"), col("doc_id").as("qid"))
      .join(allBands.select(col("band"), col("band_hash"), col("doc_id").as("cid")),
        Seq("band", "band_hash"))
      .filter(col("qid") =!= col("cid"))
      .select(least(col("qid"), col("cid")).as("doc_a"),
        greatest(col("qid"), col("cid")).as("doc_b"))
      .distinct()
    // bucketed verify path: pin the frontier-sized candidate set before
    // prunedShingles collects its endpoint buckets, so the band probe
    // runs once, not once per downstream consumer. This path is taken
    // whenever the state is bucketed — even under full BAND coverage the
    // candidate ENDPOINTS usually cover a bucket subset, and pruning the
    // text-sized shingle relation outweighs pinning a 2-longs-per-row
    // candidate set (ChainProbe A vs C: the always-pinned fold layout
    // reads level with the segments-only layout at toy scale and wins
    // at deployment ratios, bench probe_ab).
    val cand = if (bucketed) candLazy.localCheckpoint() else candLazy
    val sets =
      (if (bucketed) prunedShingles(state, cand)
       else dropBucket(state.shingles)).union(newShingles)

    val newEdges = Dedup.verifyJaccard(cand, sets)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"))

    // contract endpoints through the persisted labels: old docs collapse
    // to their cluster representative, new docs stand for themselves.
    // `newEdges` is frontier-sized, so Spark broadcasts it against the
    // corpus-sized labels relation (no labels shuffle).
    val lab = state.labels
    val contracted = newEdges
      .join(lab.select(col("doc_id").as("doc_a"), col("cluster_id").as("rep_a")),
        Seq("doc_a"), "left")
      .join(lab.select(col("doc_id").as("doc_b"), col("cluster_id").as("rep_b")),
        Seq("doc_b"), "left")
      .select(coalesce(col("rep_a"), col("doc_a")).as("a"),
        coalesce(col("rep_b"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

    // the fixpoint — on the contracted frontier graph only. Its nodes are
    // new doc ids and touched old cluster reps; since every old rep is the
    // MIN doc_id of its members, min-over-contracted-nodes equals
    // min-over-all-members, so component labels match a full recompute.
    val comp = Components.connectedComponents(contracted).localCheckpoint()
    // comp is eager, so the candidate pin has served its consumers
    // (band probe + verify) — release its blocks now rather than waiting
    // on the ContextCleaner (everything downstream reads comp only)
    if (bucketed) freeLocalCheckpoint(cand)

    val newIds = newDocs.select(col("doc_id"))
    val newAssign = newIds
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))

    // remap: old cluster rep -> merged component label. comp rows whose
    // node is a new doc id never match an old cluster_id, so no filter is
    // needed. broadcast() both because it's frontier-sized and to pin the
    // no-shuffle plan over `labels` regardless of stats.
    val remap = comp.select(col("node").as("cluster_id"),
      col("component").as("merged"))
    val oldRelabeled = lab.join(broadcast(remap), Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("merged"), col("cluster_id")).as("cluster_id"))

    // sizes: untouched clusters pass through map-side (broadcast anti);
    // only remapped clusters + new-batch counts hit a (tiny) shuffle.
    val newCounts = newAssign.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("delta"))
    val untouched = state.sizes
      .join(broadcast(remap.select(col("cluster_id"))), Seq("cluster_id"), "left_anti")
    val touched = state.sizes.join(broadcast(remap), Seq("cluster_id"))
      .select(col("merged").as("cluster_id"), col("cluster_size").as("delta"))
      .union(newCounts)
      .groupBy(col("cluster_id"))
      .agg(sum(col("delta")).as("cluster_size"))

    // the returned relations are the FULL grown state (the pruned probe
    // views above are admission-internal). Callers on the persisted path
    // never execute these — they commit the batch deltas instead
    // ([[graft.streaming.DedupStream.commitState]]); the in-memory
    // chaining path (buckets = None) unions at zero extra cost.
    DedupState(
      labels = oldRelabeled.union(newAssign),
      sizes = untouched.union(touched),
      bands = dropBucket(state.bands).union(newBands),
      shingles = dropBucket(state.shingles).union(newShingles))
  }

  /** (doc_id, cluster_id, cluster_size) — the [[Dedup.duplicateClusters]]
    * output shape, from a state. */
  def labelsWithSizes(state: DedupState): DataFrame =
    state.labels.join(state.sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))

  // ---- SparkEntry wiring -------------------------------------------------

  /** q51: day-1 corpus = doc_id % 5 != 0, day-2 drop = doc_id % 5 == 0.
    * The modulo split scatters duplicate groups across both days, so the
    * batch exercises every incremental case: new docs joining old
    * clusters, new-new pairs, a new doc BRIDGING two old clusters (merge),
    * and new docs whose id becomes the merged cluster's minimum label. */
  def qIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val oldDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val newBatch = docs.filter(col("doc_id") % 5 === 0)
    labelsWithSizes(admitBatch(initialState(oldDocs), newBatch))
      .orderBy("doc_id")
  }

  /** Oracle mirrors the incremental semantics literally: cluster the day-1
    * subset with a recursive closure, then close over
    * (old labels ∪ edges touching the day-2 batch) — and because the old
    * labeling contracts the old graph exactly, this equals a full-corpus
    * recompute. `jac` (candidate+verify chain) is [[Dedup.jaccardCtesSql]],
    * shared with q14/q37; per-pair band collisions are subset-invariant, so
    * filtering full-corpus `jac` by day is identical to banding each day's
    * subset separately. */
  val qIncrementalSql: String =
    s"""WITH RECURSIVE ${Dedup.jaccardCtesSql},
       |old_edges AS (
       |  SELECT doc_a, doc_b FROM jac
       |  WHERE jaccard >= 0.5 AND doc_a % 5 <> 0 AND doc_b % 5 <> 0),
       |new_edges AS (
       |  SELECT doc_a, doc_b FROM jac
       |  WHERE jaccard >= 0.5 AND (doc_a % 5 = 0 OR doc_b % 5 = 0)),
       |old_sym AS (SELECT doc_a AS a, doc_b AS b FROM old_edges
       |            UNION SELECT doc_b, doc_a FROM old_edges),
       |old_reach(node, root) AS (
       |  SELECT doc_id, doc_id FROM documents WHERE doc_id % 5 <> 0
       |  UNION
       |  SELECT s.b, r.root FROM old_reach r JOIN old_sym s ON s.a = r.node),
       |old_lab AS (SELECT node AS doc_id, MIN(root) AS cluster_id
       |            FROM old_reach GROUP BY node),
       |inc_edges AS (
       |  SELECT doc_id AS a, cluster_id AS b FROM old_lab
       |  UNION SELECT doc_a, doc_b FROM new_edges),
       |inc_sym AS (SELECT a, b FROM inc_edges UNION SELECT b, a FROM inc_edges),
       |inc_reach(node, root) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.b, r.root FROM inc_reach r JOIN inc_sym s ON s.a = r.node),
       |lab AS (SELECT node AS doc_id, MIN(root) AS cluster_id
       |        FROM inc_reach GROUP BY node),
       |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT lab.doc_id, lab.cluster_id, sz.cluster_size
       |FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin
}
