package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use, so `spark.sql("SELECT cosine_similarity(a,b)")`
  * works in any session built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * or via `spark.sql.extensions=graft.GraftExtensions` on a cluster —
  * the standard way to ship an engine extension to a 1000-executor
  * deployment without forking Spark.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import graft.functions.{DotProduct, MinHashSignature, ShingleSet}

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def descriptor(name: String, clazz: Class[_], arity: Int)
      (build: Seq[Expression] => Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name expects $arity argument(s), got ${children.length}")
      build(children)
    })

  /** Every native expression, SQL-callable. Parameterized expressions fix
    * the engine's constants (16-hash MinHash family, 60-bit SimHash, the
    * stopword/lang-marker lexicons) so SQL and DataFrame paths produce
    * identical values. */
  val descriptors: Seq[Descriptor] = Seq(
    descriptor("cosine_similarity", classOf[CosineSimilarity], 2)(
      c => CosineSimilarity(c.head, c(1))),
    descriptor("dot_product", classOf[DotProduct], 2)(
      c => DotProduct(c.head, c(1))),
    descriptor("shingle_set", classOf[ShingleSet], 1)(
      c => ShingleSet(c.head)),
    descriptor("minhash_signature", classOf[MinHashSignature], 1)(
      c => MinHashSignature(c.head, graft.operators.Dedup.NumHashes)),
    descriptor("simhash", classOf[graft.functions.SimHash], 1)(
      c => graft.functions.SimHash(c.head, graft.operators.Dedup.SimBits)),
    descriptor("text_profile", classOf[graft.functions.TextProfile], 1)(
      c => graft.functions.TextProfile(c.head,
        graft.operators.TextAnalysis.stopwords,
        graft.operators.TextAnalysis.langMarkers)),
  )

  /** Register on an already-built session (local/testing convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
