package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector, eigSym}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.1 M6 (scale path): Nyström kernel-feature approximation.
  *
  * PSVM approximates the n×n kernel matrix K with an n×p factor H via
  * parallel ICF (reference: psvm icf.cc). The Spark-first equivalent is
  * the Nyström method: pick m landmark rows, compute the m×m kernel block
  * K_mm on the driver (m is small), form W = U·diag(1/√λ) from its
  * eigendecomposition, and map every row x to
  *     φ(x) = W^T · [k(x, l_1), …, k(x, l_m)]
  * so that φ(x)·φ(y) ≈ k(x, y).  Training a LINEAR model on φ then
  * approximates the kernel SVM — exactly how PSVM's ICF factor feeds its
  * IPM solve, but expressed as a feature map + distributed linear solve.
  *
  * Scale: landmarks are a driver-side m×d matrix broadcast to executors;
  * the feature map is one narrow map over the data (no shuffle). The
  * expensive O(n²) kernel matrix never materializes.
  */
final case class NystromMap(
    landmarks: Array[Array[Double]],
    w: Array[Array[Double]],   // m×m projection W = U·diag(1/√λ⁺)
    kernel: Kernel) extends Serializable {

  val rank: Int = w.headOption.map(_.length).getOrElse(0)

  /** φ(x) for one vector (executor-local). */
  def features(x: Array[Double]): Array[Double] = {
    val m = landmarks.length
    val kx = new Array[Double](m)
    var i = 0
    while (i < m) { kx(i) = kernel(x, landmarks(i)); i += 1 }
    val out = new Array[Double](rank)
    var j = 0
    while (j < rank) {
      var s = 0.0; var i2 = 0
      while (i2 < m) { s += w(i2)(j) * kx(i2); i2 += 1 }
      out(j) = s; j += 1
    }
    out
  }

  /** [[features]] straight off Catalyst array data — called from the
    * generated code of [[NystromFeatures]], no per-row boxing. */
  def featuresFromArrayData(
      a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Double] =
    features(a.toDoubleArray())

  /** Column form of the feature map: a native expression whose generated
    * code calls the tight JVM loop above with the map held as a codegen
    * reference object — one narrow map, no shuffle, no UDF ser/deser
    * boundary, so the surrounding projection stays in whole-stage
    * codegen. */
  def featuresCol: Column =
    org.apache.spark.sql.graft.GraftShim.column(
      NystromFeatures(
        org.apache.spark.sql.graft.GraftShim.expression(col("__vec")), this))
}

/** Fused `φ(x)` over an array<double> column (see [[NystromMap.featuresCol]]). */
case class NystromFeatures(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    map: NystromMap)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def prettyName: String = "nystrom_features"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(map.featuresFromArrayData(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("nystromMap", map, classOf[NystromMap].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"$mapRef.featuresFromArrayData($a));")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): NystromFeatures =
    copy(child = c)
}

object Nystrom {

  /** Landmark selection: a SEEDED uniform sample (deterministic for a
    * fixed input layout), thinned to exactly m by id order. Sampling
    * first means the ordering pass runs over ~4m sampled rows, not the
    * whole dataset, and — unlike "first m ids" — the landmarks cover the
    * data distribution even when ids correlate with content (sorted
    * ingest, range-partitioned corpora), which is what the Nyström
    * approximation quality depends on. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          kernel: Kernel, numLandmarks: Int, ridge: Double = 1e-10,
          seed: Long = 42L): NystromMap = {
    val slim = df.select(col(idCol), col(vecCol))
    val n = slim.count()
    val frac = if (n == 0) 1.0 else math.min(1.0, numLandmarks * 4.0 / n)
    val sampled =
      if (frac >= 1.0) slim
      else slim.sample(withReplacement = false, frac, seed)
    var picked = sampled.orderBy(col(idCol)).limit(numLandmarks).collect()
    // a 4x-oversampled Bernoulli sample undershoots m with negligible
    // probability, but correctness can't ride on "negligible"
    if (picked.length < numLandmarks && frac < 1.0)
      picked = slim.orderBy(col(idCol)).limit(numLandmarks).collect()
    val landmarks: Array[Array[Double]] = picked
      .map(_.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)

    val m = landmarks.length
    val kmm = DenseMatrix.tabulate(m, m)((i, j) => kernel(landmarks(i), landmarks(j)))
    NystromMap(landmarks, projectionOf(kmm, m, ridge), kernel)
  }

  /** W = U·diag(1/√λ⁺) from the ridged symmetric eigendecomposition of
    * K_mm — shared by the dense fit above and [[SparseNystrom.fit]]
    * (the projection step is representation-agnostic: only the kernel
    * evaluations differ between dense and sparse rows). */
  private[ml] def projectionOf(kmm: DenseMatrix[Double], m: Int,
                               ridge: Double): Array[Array[Double]] = {
    // symmetric eigendecomposition; ridge guards repeated landmarks
    val es = eigSym(kmm + DenseMatrix.eye[Double](m) * ridge)
    val lambda: DenseVector[Double] = es.eigenvalues
    val u: DenseMatrix[Double] = es.eigenvectors
    val tol = 1e-12 * math.max(1.0, breeze.linalg.max(lambda))
    // W = U · diag(1/sqrt(λ)) for λ > tol (pseudo-inverse square root)
    val keep = (0 until m).filter(lambda(_) > tol)
    Array.tabulate(m, keep.length)((i, jj) => u(i, keep(jj)) / math.sqrt(lambda(keep(jj))))
  }

  /** Attach φ(x) as `featCol` (array<double>). */
  def transform(df: DataFrame, vecCol: String, map: NystromMap, featCol: String): DataFrame = {
    import graft.functions.VectorOps
    df.withColumn("__vec", VectorOps.toDoubleArray(col(vecCol)))
      .withColumn(featCol, map.featuresCol)
      .drop("__vec")
  }
}
