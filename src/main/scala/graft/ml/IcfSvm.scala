package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** The complete reference pipeline (psvm svm_train.cc): greedy-pivot ICF
  * of the kernel matrix → SMW interior-point dual solve → support-vector
  * model, scored with the ORIGINAL kernel (not a feature-map proxy):
  *     f(x) = Σ_{i∈SV} αᵢ yᵢ k(xᵢ, x) + b.
  *
  * Scale: ICF and IPM are fully distributed (see [[Icf]], [[Ipm]]).
  * Scoring broadcasts the support-vector set; α > ε keeps it sparse for
  * well-separated data. For SV sets beyond broadcast range, score via a
  * join on an LSH-bucketed SV table instead — same decision sum.
  */
final case class IcfSvmModel(
    kernel: Kernel,
    svX: Array[Array[Double]],   // support vectors' inputs
    svCoef: Array[Double],       // alpha_i * y_i
    bias: Double) extends Serializable {

  def numSupportVectors: Int = svX.length

  /** Adds `decision` and `prediction` (±1) columns over `vecCol`. */
  def predict(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val bcX = spark.sparkContext.broadcast(svX)
    val bcC = spark.sparkContext.broadcast(svCoef)
    val k = kernel
    val b = bias
    val scoreUdf = udf { (x: Seq[Double]) =>
      val xa = x.toArray
      var s = 0.0; var i = 0
      val svs = bcX.value; val cs = bcC.value
      while (i < svs.length) { s += cs(i) * k(svs(i), xa); i += 1 }
      s + b
    }
    df.withColumn("decision", scoreUdf(VectorOps.toDoubleArray(col(vecCol))))
      .withColumn("prediction", when(col("decision") >= 0, 1.0).otherwise(-1.0))
  }
}

object IcfSvmTrainer {

  /** M6+M7+M8 end-to-end: labels must be ±1 in labelCol. */
  def fit(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
          kernel: Kernel, rank: Int, c: Double = 1.0,
          maxIter: Int = 60, tol: Double = 1e-5,
          svEpsilon: Double = 1e-4): IcfSvmModel = {
    val spark = df.sparkSession

    val h = Icf.factorize(df, idCol, vecCol, kernel, rank)
    val joined = df
      .select(col(idCol).cast("long").as("__id"),
              VectorOps.toDoubleArray(col(vecCol)).as("__x"),
              col(labelCol).cast("double").as("__y"))
      .join(h.withColumnRenamed("id", "__id"), Seq("__id"))
      .persist()

    val (alphas, _, _) = Ipm.solve(joined, "__id", "__y", "icf_features", c,
      maxIter = maxIter, tol = tol)
    val alphaDf = spark.createDataFrame(alphas).toDF("__id", "__alpha")

    val withAlpha = joined.join(alphaDf, Seq("__id")).persist()

    // support vectors: alpha above threshold (collect is bounded by the
    // SV count, not n — the PSVM model file stores exactly this set)
    val eps = svEpsilon * c
    val svs = withAlpha.filter(col("__alpha") > eps)
      .select(col("__x"), col("__y") * col("__alpha"), col("__alpha"), col("__y"))
      .collect()
    val svX = svs.map(_.getSeq[Double](0).toArray)
    val svCoef = svs.map(_.getDouble(1))

    // bias from free SVs' KKT: b = mean(y_i − Σ_j coef_j k(x_j, x_i))
    val free = svs.filter(r => r.getDouble(2) < c * (1 - 1e-3))
    val bias =
      if (free.isEmpty) 0.0
      else free.map { r =>
        val xi = r.getSeq[Double](0).toArray
        var s = 0.0; var j = 0
        while (j < svX.length) { s += svCoef(j) * kernel(svX(j), xi); j += 1 }
        r.getDouble(3) - s
      }.sum / free.length

    joined.unpersist(); withAlpha.unpersist()
    IcfSvmModel(kernel, svX, svCoef, bias)
  }
}
