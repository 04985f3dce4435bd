package graft.operators

import org.apache.spark.sql.DataFrame

/** Test-only bridge to [[SubstringDedup]]'s package-private window
  * relation, so the spec can pin the persisted log's O(batch) segment
  * writes and window-set identity without widening the production
  * visibility. */
object SubstringDedupSpecAccess {
  def windowCount(docs: DataFrame): Long =
    SubstringDedup.windowRel(docs, SubstringDedup.DedupK).count()

  def windowSet(docs: DataFrame): Set[(Long, Long, String)] =
    SubstringDedup.windowRel(docs, SubstringDedup.DedupK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
}
