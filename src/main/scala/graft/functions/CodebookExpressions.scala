package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.types._

/** Fused codebook/centroid expressions for the ANN family (guide §4:
  * keep the hot path in single codegen loops, and keep the PLAN small).
  *
  * The literal-tree forms these replace built one fused `sq_distance`
  * per centroid/codeword with the centroid as an `array(lit…)` subtree:
  * nlist(16) × dim(64) or m(8)·k(16) × sub(8) literal nodes PER CALL
  * SITE, multiplied again by CollapseProject inlining. p7c/p7d plans
  * carried thousands of literal nodes whose analysis + janino cost
  * dominated their steady-state runs (measured ~4s of per-run planning
  * gap at sf0.1 for p7d, §OPTIMIZATION_r14). Each expression here holds
  * the table as ONE reference object (the [[graft.ml.SparseNystromFeatures]]
  * pattern) and generates the same arithmetic in the same order, so
  * every output double/int is bit-identical to the literal form:
  *
  *   - distances: d_c = Σ_j (v_j − c_j)², j ascending, c ascending —
  *     exactly [[SqDistance]]'s left-to-right accumulation;
  *   - argmin: strict `<` keeps the FIRST minimal index — exactly
  *     `array_position(d, array_min(d)) − 1`;
  *   - residual: v_j − c_j per dim — exactly `zip_with(v, c, _-_)` on
  *     equal-length inputs;
  *   - PQ encode/ADC table iterate subspaces in order with the same
  *     per-subspace sq-distance loops.
  */
object CodebookExpressions {

  /** Array of squared distances to every centroid (nlist entries). */
  def centroidSqDistances(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftShim.column(CentroidSqDistances(GraftShim.expression(vec), centroids))

  /** 0-based index of the nearest centroid (first index on ties). */
  def centroidArgmin(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftShim.column(CentroidArgmin(GraftShim.expression(vec), centroids))

  /** vec − centroids(cell), per dimension. */
  def centroidResidual(vec: Column, cell: Column,
                       centroids: Array[Array[Double]]): Column =
    GraftShim.column(CentroidResidual(
      GraftShim.expression(vec), GraftShim.expression(cell), centroids))

  /** PQ code: per subspace, the 0-based nearest-codeword index. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftShim.column(PqEncode(GraftShim.expression(vec), codebooks))

  /** Flat m·k ADC table: subspace-major squared distances. */
  def pqAdcTable(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftShim.column(PqAdcTable(GraftShim.expression(vec), codebooks))
}

private[functions] trait VecArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
}

/** d_c = Σ_j (v_j − c_j)² for every centroid c, [[SqDistance]] order. */
case class CentroidSqDistances(child: Expression,
                               centroids: Array[Array[Double]])
  extends UnaryExpression with VecArrayInput {

  override def prettyName: String = "centroid_sq_distances"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def compute(v: ArrayData): Array[Double] = {
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cw = centroids(c)
      val n = math.min(v.numElements(), cw.length)
      var s = 0.0; var j = 0
      while (j < n) { val d = v.getDouble(j) - cw(j); s += d * d; j += 1 }
      out(c) = s; c += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(compute(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidSqDists", this,
      classOf[CentroidSqDistances].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"$ref.computeForCodegen($a));")
  }

  def computeForCodegen(v: ArrayData): Array[Double] = compute(v)

  override protected def withNewChildInternal(c: Expression): CentroidSqDistances =
    copy(child = c)
}

/** First 0-based argmin over the centroid distances (strict `<`). */
case class CentroidArgmin(child: Expression,
                          centroids: Array[Array[Double]])
  extends UnaryExpression with VecArrayInput {

  override def prettyName: String = "centroid_argmin"
  override def dataType: DataType = IntegerType

  def computeForCodegen(v: ArrayData): Int = {
    var best = Double.MaxValue; var bi = 0
    var c = 0
    while (c < centroids.length) {
      val cw = centroids(c)
      val n = math.min(v.numElements(), cw.length)
      var s = 0.0; var j = 0
      while (j < n) { val d = v.getDouble(j) - cw(j); s += d * d; j += 1 }
      if (s < best) { best = s; bi = c }
      c += 1
    }
    bi
  }

  override def nullSafeEval(a: Any): Any =
    computeForCodegen(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgmin", this,
      classOf[CentroidArgmin].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeForCodegen($a);")
  }

  override protected def withNewChildInternal(c: Expression): CentroidArgmin =
    copy(child = c)
}

/** vec − centroids(cell) per dimension (`zip_with` on equal lengths). */
case class CentroidResidual(left: Expression, right: Expression,
                            centroids: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "centroid_residual"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, int), got ${l.simpleString}, ${r.simpleString}")
    }

  def computeForCodegen(v: ArrayData, cell: Int): GenericArrayData = {
    val cw = centroids(cell)
    val n = v.numElements()
    val out = new Array[Double](n)
    var j = 0
    while (j < n) { out(j) = v.getDouble(j) - cw(j); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    computeForCodegen(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidResidual", this,
      classOf[CentroidResidual].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.computeForCodegen($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CentroidResidual =
    copy(left = l, right = r)
}

/** PQ code array: per subspace s, first argmin codeword of the s-th
  * dim-slice (identical slice bounds and accumulation order to the
  * `slice` + `sq_distance` + `array_position(array_min)` form). */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with VecArrayInput {

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def computeForCodegen(v: ArrayData): GenericArrayData = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val out = new Array[Int](m)
    var s = 0; var off = 0
    while (s < m) {
      val cws = codebooks(s)
      var best = Double.MaxValue; var bi = 0
      var c = 0
      while (c < cws.length) {
        val cw = cws(c)
        var acc = 0.0; var j = 0
        while (j < sub) { val d = v.getDouble(off + j) - cw(j); acc += d * d; j += 1 }
        if (acc < best) { best = acc; bi = c }
        c += 1
      }
      out(s) = bi; s += 1; off += sub
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    computeForCodegen(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeForCodegen($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Flat m·k ADC table, subspace-major, [[SqDistance]] order per cell. */
case class PqAdcTable(child: Expression,
                      codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with VecArrayInput {

  override def prettyName: String = "pq_adc_table"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def computeForCodegen(v: ArrayData): GenericArrayData = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val k = codebooks(0).length
    val out = new Array[Double](m * k)
    var s = 0; var off = 0
    while (s < m) {
      val cws = codebooks(s)
      var c = 0
      while (c < cws.length) {
        val cw = cws(c)
        var acc = 0.0; var j = 0
        while (j < sub) { val d = v.getDouble(off + j) - cw(j); acc += d * d; j += 1 }
        out(s * k + c) = acc; c += 1
      }
      s += 1; off += sub
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    computeForCodegen(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeForCodegen($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcTable =
    copy(child = c)
}
