package graft.operators

/** The ONE place that renders sign-bit LSH bucketing as DuckDB SQL for
  * the oracles — single-bucket rows ([[bucketRowsSql]]) and the
  * multi-probe expansion ([[multiProbeRowsSql]]) — shared by the q18/q69
  * ANN oracles (plane base 0, 8×4 grid) and the q58/q61/q62/q63/q68
  * near-dup oracles (based planes, 16×8 grid), so the replay semantics
  * (projection accumulation order, margin tie-breaks, XOR flips, null
  * contract) cannot drift between the two families.
  *
  * Null contract, pinned to the engine expressions
  * ([[graft.functions.LshBuckets]] / LshBucketsMultiProbe):
  *  - a WHOLE-NULL embedding emits NO bucket rows (the expression
  *    null-propagates and posexplode drops the row) — `WHERE embedding
  *    IS NOT NULL`;
  *  - a null ELEMENT emits all-zero own+probe buckets — the `hasnull`
  *    guard (DuckDB's list_sum SKIPS null terms, so an unguarded
  *    partial sum could set sign bits the engine never does).
  */
private[operators] object LshSql {

  private def projExpr(plane: Int): String =
    s"""list_sum(list_transform(range(0, 64), i ->
       |  embedding[i + 1] * (((('0x' || substr(md5('$plane:' || i::VARCHAR), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)))""".stripMargin

  /** One SELECT per table over `src` yielding (vec_id, t, bucket). */
  def bucketRowsSql(src: String, planeBase: Int, tables: Int,
      planes: Int): String = {
    def bucketExpr(t: Int): String =
      "CASE WHEN len(list_filter(embedding, x -> x IS NULL)) > 0 THEN 0 ELSE " +
        (0 until planes).map { p =>
          s"""CASE WHEN ${projExpr(planeBase + t * planes + p)} > 0 THEN ${1L << p} ELSE 0 END"""
        }.mkString(" +\n  ") + " END"
    (0 until tables).map(t =>
      s"""SELECT vec_id, $t AS t, ${bucketExpr(t)} AS bucket FROM ($src)
         |WHERE embedding IS NOT NULL""".stripMargin)
      .mkString("\nUNION ALL\n")
  }

  /** One SELECT per table over `src` yielding (vec_id, t, bucket) with
    * the multi-probe expansion: the own bucket plus `probes` XOR flips
    * of the smallest-|projection| planes (ties to the lower plane index
    * — DuckDB's struct sort on (abs, plane) replays the expression's
    * selection exactly). */
  def multiProbeRowsSql(src: String, planeBase: Int, tables: Int,
      planes: Int, probes: Int): String = {
    val zeroProbes = List.fill(probes)("0::BIGINT").mkString("[", ", ", "]")
    (0 until tables).map { t =>
      val projList = (0 until planes)
        .map(p => projExpr(planeBase + t * planes + p))
        .mkString("[", ",\n ", "]")
      s"""SELECT vec_id, $t AS t, unnest([own] ||
         |  CASE WHEN hasnull THEN $zeroProbes ELSE list_transform(
         |    list_slice(list_sort(list_transform(range(0, $planes),
         |      p -> {'a': abs(projs[(p+1)::INT]), 'p': p})), 1, $probes),
         |    x -> xor(own, (1::BIGINT << (x.p)::INT))) END) AS bucket
         |FROM (SELECT vec_id,
         |        CASE WHEN hasnull THEN 0 ELSE
         |          list_sum(list_transform(range(0, $planes), p ->
         |            CASE WHEN projs[(p+1)::INT] > 0 THEN (1::BIGINT << p::INT) ELSE 0 END)) END::BIGINT AS own,
         |        projs, hasnull
         |      FROM (SELECT vec_id, $projList AS projs,
         |              len(list_filter(embedding, x -> x IS NULL)) > 0 AS hasnull
         |            FROM ($src) WHERE embedding IS NOT NULL))""".stripMargin
    }.mkString("\nUNION ALL\n")
  }
}
