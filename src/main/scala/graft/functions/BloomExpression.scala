package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built `util.sketch.BloomFilter`,
  * shipped to executors as the serialized sketch bytes inside the
  * expression (the task deserializes once, lazily). The native-expression
  * shape (vs a Scala UDF) keeps the engine's zero-UDF property and the
  * per-row cost at two murmur hashes — the standard Spark sketch, NOT the
  * engine's portable md5 hash60, which is fine because a Bloom prefilter
  * is engine-internal: every maybe-hit is re-checked by an exact join, so
  * no sketch bit ever reaches a result (see [[graft.operators.Corpus
  * .decontaminateBloom]]).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, got ${child.dataType.catalogString}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomFns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** `mightContain(bloom, c)` as a Column. The filter must have been
    * built over the UTF-8 bytes of the same strings (`putBinary` /
    * `DataFrameStatFunctions.bloomFilter` on a string column both do). */
  def bloomMightContain(c: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    Bridge.column(BloomMightContain(Bridge.expression(c), bos.toByteArray))
  }
}
