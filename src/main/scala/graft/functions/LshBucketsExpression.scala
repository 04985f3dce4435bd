package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All multi-table LSH bucket ids of an embedding in one fused pass:
  * for each table t, project the vector onto that table's sign-bit
  * hyperplanes and pack the signs into a bucket id. Returns
  * array<long>(numTables).
  *
  * Replaces numTables × planesPerTable interpreted `zip_with`/`aggregate`
  * pairs per row (32 boxed folds over dim-64 arrays dominated the ANN
  * bucketing stage). Accumulation is per-plane in index order — identical
  * doubles to the HOF formulation and the DuckDB oracle's
  * `list_sum(list_transform(...))`.
  *
  * `weights(t*planesPerTable + p)(i)` must be the same md5-derived values
  * the oracle recomputes in SQL (see [[graft.operators.Similarity.planeWeight]]).
  */
case class LshBuckets(child: Expression, weights: Seq[Seq[Double]],
    planesPerTable: Int) extends UnaryExpression with CodegenFallback {

  @transient private lazy val w: Array[Array[Double]] = weights.map(_.toArray).toArray
  private def numTables: Int = weights.length / planesPerTable

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<float>/array<double>, got ${other.catalogString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val isFloat = elemIsFloat
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      // null element: the composable formulation null-propagates the
      // projection, making every CASE fall to the 0 branch — all-zero
      // buckets. The DuckDB oracles pin the same contract explicitly
      // (list_sum there SKIPS null terms, so they carry a hasnull
      // guard rather than relying on propagation).
      if (emb.isNullAt(i)) return new GenericArrayData(new Array[Long](numTables))
      vec(i) = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      i += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val pw = w(t * planesPerTable + p)
        val dims = math.min(n, pw.length)
        var proj = 0.0
        var d = 0
        while (d < dims) { proj += vec(d) * pw(d); d += 1 }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multi-probe variant: for each table, the vector's OWN bucket followed
  * by `probes` neighbor buckets — the own id with the sign bit flipped
  * on the planes of SMALLEST projection magnitude (ties to the lower
  * plane index), i.e. the buckets a near-duplicate that narrowly
  * disagreed on a hyperplane most likely landed in (the classic
  * multi-probe LSH recall lever: more candidate mass per table instead
  * of more tables). Returns a flat array<long> of
  * numTables × (1 + probes) ids, grouped per table in emission order —
  * consumers recover the table as `pos / (1 + probes)`. Projections are
  * the identical per-plane accumulations as [[LshBuckets]] (and the
  * DuckDB oracle), so the own buckets — and therefore the single-probe
  * pair set — are bit-identical to the base expression's. */
case class LshBucketsMultiProbe(child: Expression, weights: Seq[Seq[Double]],
    planesPerTable: Int, probes: Int)
    extends UnaryExpression with CodegenFallback {

  require(probes >= 1 && probes <= planesPerTable,
    s"probes must be in [1, $planesPerTable], got $probes")

  @transient private lazy val w: Array[Array[Double]] = weights.map(_.toArray).toArray
  private def numTables: Int = weights.length / planesPerTable

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets_multiprobe expects array<float>/array<double>, got ${other.catalogString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val isFloat = elemIsFloat
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      // null element → all-zero buckets, as the base expression
      if (emb.isNullAt(i))
        return new GenericArrayData(new Array[Long](numTables * (1 + probes)))
      vec(i) = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      i += 1
    }
    val out = new Array[Long](numTables * (1 + probes))
    val projs = new Array[Double](planesPerTable)
    // hoisted out of the per-row × per-table hot loop (the base
    // expression exists to kill exactly this class of allocation);
    // re-initialized per table below
    val order = new Array[Int](planesPerTable)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val pw = w(t * planesPerTable + p)
        val dims = math.min(n, pw.length)
        var proj = 0.0
        var d = 0
        while (d < dims) { proj += vec(d) * pw(d); d += 1 }
        if (proj > 0) bucket |= (1L << p)
        projs(p) = math.abs(proj)
        p += 1
      }
      out(t * (1 + probes)) = bucket
      // probe planes: the `probes` smallest |projection|s, ties to the
      // lower plane index — selection sort over ≤ planesPerTable entries
      var oi = 0
      while (oi < planesPerTable) { order(oi) = oi; oi += 1 }
      var k = 0
      while (k < probes) {
        var best = k
        var j = k + 1
        while (j < planesPerTable) {
          if (projs(order(j)) < projs(order(best)) ||
              (projs(order(j)) == projs(order(best)) && order(j) < order(best)))
            best = j
          j += 1
        }
        val tmp = order(k); order(k) = order(best); order(best) = tmp
        out(t * (1 + probes) + 1 + k) = bucket ^ (1L << order(k))
        k += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshFns {
  import org.apache.spark.sql.graftbridge.Bridge

  def lshBuckets(emb: Column, weights: Seq[Seq[Double]], planesPerTable: Int): Column =
    Bridge.column(LshBuckets(Bridge.expression(emb), weights, planesPerTable))

  def lshBucketsMultiProbe(emb: Column, weights: Seq[Seq[Double]],
      planesPerTable: Int, probes: Int): Column =
    Bridge.column(LshBucketsMultiProbe(Bridge.expression(emb), weights,
      planesPerTable, probes))
}
