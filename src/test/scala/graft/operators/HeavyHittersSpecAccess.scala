package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-only bridge to [[HeavyHitters]]' private build pass, so the
  * spec can pin chained-sketch ≡ one-shot-grid linearity without
  * widening the production visibility. */
object HeavyHittersSpecAccess {
  def oneShotGrid(docs: DataFrame): Array[Array[Long]] = {
    val grid = Array.fill(HeavyHitters.CmsDepth, HeavyHitters.CmsWidth)(0L)
    docs.select(explode(graft.functions.TextFns.shingles(col("text"),
        HeavyHitters.GramN)).as("gram"))
      .select(posexplode(array(
        (0 until HeavyHitters.CmsDepth)
          .map(d => HeavyHitters.bucketCol(d, col("gram"))): _*))
        .as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket")).agg(count(lit(1)).as("c"))
      .collect()
      .foreach(r => grid(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    grid
  }
}
