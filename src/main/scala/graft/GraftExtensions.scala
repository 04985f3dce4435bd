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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
  }
}

object GraftExtensions {
  /** (name, info, builder) descriptor for cosine_similarity(a, b). */
  val cosineSimilarityDescriptor:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"cosine_similarity expects 2 arguments, got ${children.length}")
      CosineSimilarity(children.head, children(1))
    })

  /** Register on an already-built session (local/testing convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = cosineSimilarityDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
