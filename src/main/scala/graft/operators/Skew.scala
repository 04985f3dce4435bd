package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for heavy-hitter keys at 100 TB.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer; at 100 TB a single key holding 1% of the data is a ~1 TB
  * reducer partition — guaranteed spill or OOM. Two-phase salted
  * aggregation bounds every reducer at ~1/saltBuckets of the hot key:
  *
  *   phase 1: group by (key, salt)   — salt = uniform bucket per row
  *   phase 2: group by key, combine the partials
  *
  * Associative aggregates (count/sum/min/max) combine losslessly; the
  * result is row-identical to the unsalted aggregation (asserted in
  * SkewSpec). AQE's skew-join splitting handles the join-side analog
  * (enabled by default in the session configs used here).
  *
  * The salt is `pmod(hash(random-ish per-row expr), buckets)`; we use a
  * deterministic row fingerprint rather than rand() so results are
  * reproducible and retries/speculative tasks agree.
  */
object Skew {

  /** Two-phase salted count/sum aggregation, lossless vs direct groupBy.
    *
    * @param df       input
    * @param key      grouping column name
    * @param sums     columns to sum (become `sum_<name>`)
    * @param saltExpr deterministic per-row expression to derive the salt
    * @param buckets  salt fan-out (bounds the per-reducer share of a hot key)
    */
  def saltedAgg(df: DataFrame, key: String, sums: Seq[String],
      saltExpr: Column, buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltExpr), lit(buckets)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sums.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    phase1.groupBy(col(key))
      .agg(sum(col("__cnt")).as("n_rows"),
        sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Salt-grid sides for an EXACT blocked decomposition of an all-pairs-
    * within-bucket self-join — the join-side analog of [[saltedAgg]] for
    * the band-bucket joins (LSH, SimHash) where one hot bucket value
    * (e.g. a boilerplate-heavy band under language/domain bias) would
    * otherwise form a single |bucket|² join group on one reducer.
    *
    * Each row gets a deterministic salt block s = hash(id) mod B. The
    * LEFT side replicates a row to grid cells (s, j) for j in [s, B); the
    * RIGHT side to cells (i, s) for i in [0, s]. Joining on
    * (bucketKeys…, __cell_lo, __cell_hi) lands every unordered pair in
    * EXACTLY ONE cell — cross-block pairs {a: i, b: j} only in (i, j)
    * oriented (a, b); same-block pairs in the diagonal (i, i) in BOTH
    * orientations, so callers canonicalize with least/greatest (+ the
    * distinct they already carry) instead of an id inequality. Row-set-
    * identical to the unsalted self-join (asserted in DedupSpec).
    *
    * Cost: ~(B/2 + 1)× row replication per side, in exchange for the
    * hottest join group shrinking from |bucket| to ~|bucket|/B per side
    * (reducer work per cell drops B²-fold) — hot-key relief, not a
    * default. The salt hashes VALUES, so retries and speculative tasks
    * agree. */
  def saltGridSides(rel: DataFrame, idCol: String,
      buckets: Int): (DataFrame, DataFrame) = {
    require(buckets > 1, s"salt grid needs buckets > 1, got $buckets")
    val salted = rel.withColumn("__salt", pmod(hash(col(idCol)), lit(buckets)))
    val left = salted
      .withColumn("__cell_hi", explode(sequence(col("__salt"), lit(buckets - 1))))
      .withColumnRenamed("__salt", "__cell_lo")
    val right = salted
      .withColumn("__cell_lo", explode(sequence(lit(0), col("__salt"))))
      .withColumnRenamed("__salt", "__cell_hi")
    (left, right)
  }
}
