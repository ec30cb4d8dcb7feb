package graft.ml

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.1 M6/M16 (sparse scale path): the Nyström kernel-feature map over
  * SPARSE rows — the reference's native data regime (psvm document.cc
  * stores `idx:val` sparse rows; its benchmark corpora are rcv1-class,
  * ~47k dims with ~75 non-zeros per row). The dense [[NystromMap]]
  * would carry dim doubles per row THROUGH the feature map (47k dims =
  * ~370 KB/row — 22 TB of scan for a 60M-row corpus that is ~60 GB
  * sparse), so the whole pipeline stays in the (indices, values) pair
  * representation until the map emits its rank-sized dense φ(x), which
  * is what every downstream consumer (LinearSVC, IPM, scoring) reads.
  *
  * The landmark kernel evaluations use the fused sparse merge-join
  * kernels ([[graft.functions.SparseMergeBinary]]) — O(nnz) per pair
  * and bit-identical to the dense kernels on the same data, so a
  * sparse-fit model scores EXACTLY like its densified twin (pinned by
  * SparseMlSpec).
  */
final case class SparseNystromMap(
    landIdx: Array[Array[Int]],
    landVal: Array[Array[Double]],
    w: Array[Array[Double]],   // m×rank projection W = U·diag(1/√λ⁺)
    kernel: Kernel) extends Serializable {

  val rank: Int = w.headOption.map(_.length).getOrElse(0)

  /** φ(x) for one sparse vector (executor-local; same W^T·k(x,·) loop
    * shape as the dense map so the two agree bit-for-bit). */
  def features(xi: Array[Int], xv: Array[Double]): Array[Double] = {
    val m = landIdx.length
    val kx = new Array[Double](m)
    var i = 0
    while (i < m) { kx(i) = kernel.sparse(xi, xv, landIdx(i), landVal(i)); i += 1 }
    val out = new Array[Double](rank)
    var j = 0
    while (j < rank) {
      var s = 0.0; var i2 = 0
      while (i2 < m) { s += w(i2)(j) * kx(i2); i2 += 1 }
      out(j) = s; j += 1
    }
    out
  }

  /** [[features]] straight off Catalyst array data (no boxing). */
  def featuresFromArrayData(
      ia: org.apache.spark.sql.catalyst.util.ArrayData,
      va: org.apache.spark.sql.catalyst.util.ArrayData): Array[Double] =
    features(ia.toIntArray(), va.toDoubleArray())

  /** Column form over (indices, values) columns — native codegen map,
    * one narrow pass, no shuffle (the sparse twin of
    * [[NystromMap.featuresCol]]). */
  def featuresCol(idxCol: Column, valCol: Column): Column =
    org.apache.spark.sql.graft.GraftShim.column(
      SparseNystromFeatures(
        org.apache.spark.sql.graft.GraftShim.expression(idxCol),
        org.apache.spark.sql.graft.GraftShim.expression(valCol), this))
}

/** Fused `φ(x)` over an (array<int>, array<double>) sparse pair. */
case class SparseNystromFeatures(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    map: SparseNystromMap)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def prettyName: String = "sparse_nystrom_features"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(map.featuresFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("sparseNystromMap", map,
      classOf[SparseNystromMap].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"$mapRef.featuresFromArrayData($a, $b));")
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): SparseNystromFeatures =
    copy(left = l, right = r)
}

object SparseNystrom {

  /** Landmark selection + K_mm + projection, all on sparse pairs — the
    * same seeded-sample/thin-by-id discipline as [[Nystrom.fit]] (the
    * comments there explain why sample-then-order); K_mm entries come
    * from the local sparse merge kernels, and the eigen/projection step
    * is shared. */
  def fit(df: DataFrame, idCol: String, idxCol: String, valCol: String,
          kernel: Kernel, numLandmarks: Int, ridge: Double = 1e-10,
          seed: Long = 42L): SparseNystromMap = {
    val slim = df.select(col(idCol), col(idxCol), col(valCol))
    val n = slim.count()
    val frac = if (n == 0) 1.0 else math.min(1.0, numLandmarks * 4.0 / n)
    val sampled =
      if (frac >= 1.0) slim
      else slim.sample(withReplacement = false, frac, seed)
    var picked = sampled.orderBy(col(idCol)).limit(numLandmarks).collect()
    if (picked.length < numLandmarks && frac < 1.0)
      picked = slim.orderBy(col(idCol)).limit(numLandmarks).collect()
    val li: Array[Array[Int]] = picked.map(_.getSeq[Int](1).toArray)
    val lv: Array[Array[Double]] = picked.map(_.getSeq[Double](2).toArray)
    val m = li.length
    val kmm = DenseMatrix.tabulate(m, m)((i, j) =>
      kernel.sparse(li(i), lv(i), li(j), lv(j)))
    SparseNystromMap(li, lv, Nystrom.projectionOf(kmm, m, ridge), kernel)
  }

  /** Attach φ(x) as `featCol` (array<double>). */
  def transform(df: DataFrame, idxCol: String, valCol: String,
                map: SparseNystromMap, featCol: String): DataFrame =
    df.withColumn(featCol, map.featuresCol(col(idxCol), col(valCol)))
}
