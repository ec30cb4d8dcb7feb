package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorOps

/** The complete reference pipeline (psvm svm_train.cc): greedy-pivot ICF
  * of the kernel matrix → SMW interior-point dual solve → support-vector
  * model, scored with the ORIGINAL kernel (not a feature-map proxy):
  *     f(x) = Σ_{i∈SV} αᵢ yᵢ k(xᵢ, x) + b.
  *
  * Scale: ICF and IPM are fully distributed (see [[Icf]], [[Ipm]]), and
  * the support-vector set STAYS a DataFrame end-to-end — on
  * non-separable data the SV set is O(n), so the driver never collects
  * it. Scoring is a kernel-sum join: broadcast the SV side when it is
  * small enough, otherwise a partitioned cross join; either way the
  * per-row decision sum is one distributed aggregation keyed on the row
  * id. The driver holds only scalars (bias, counts).
  */
final case class IcfSvmModel(
    kernel: Kernel,
    svs: DataFrame,              // (sv_x: array<double>, sv_coef: double = α·y)
    numSupportVectors: Long,     // counted once at fit time
    bias: Double,
    broadcastThreshold: Long = 65536) {

  /** Adds `decision` and `prediction` (±1) columns over `vecCol`,
    * keyed by the (unique) `idCol`. */
  def predict(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val svSide0 = svs.select(col("sv_x"), col("sv_coef"))
    val svSide = if (numSupportVectors <= broadcastThreshold) broadcast(svSide0) else svSide0
    val scores = df
      .select(col(idCol).as("__pid"), VectorOps.toDoubleArray(col(vecCol)).as("__px"))
      .crossJoin(svSide)
      .groupBy(col("__pid"))
      .agg(sum(col("sv_coef") * kernel(col("sv_x"), col("__px"))).as("__ksum"))
      .select(col("__pid"), (col("__ksum") + lit(bias)).as("decision"))
    df.join(scores, df(idCol) === scores("__pid"))
      .drop("__pid")
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

    // support vectors: alpha above threshold — kept DISTRIBUTED (on
    // non-separable data this set is O(n); psvm's model.cc writes it to
    // sharded files for the same reason)
    val eps = svEpsilon * c
    val svDf = joined.join(alphaDf, Seq("__id"))
      .filter(col("__alpha") > eps)
      .select(col("__id").as("sv_id"), col("__x").as("sv_x"),
              (col("__y") * col("__alpha")).as("sv_coef"),
              col("__alpha").as("sv_alpha"), col("__y").as("sv_y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSv = svDf.count()

    // bias from free SVs' KKT: b = mean_i(y_i − Σ_j coef_j k(x_j, x_i)),
    // computed as a distributed kernel-sum join (only the final scalar
    // reaches the driver)
    val free = svDf.filter(col("sv_alpha") < c * (1 - 1e-3))
      .select(col("sv_id").as("__fid"), col("sv_x").as("__fx"), col("sv_y").as("__fy"))
    val svSide0 = svDf.select(col("sv_x"), col("sv_coef"))
    val svSide = if (nSv <= 65536) broadcast(svSide0) else svSide0
    val biasRow = free.crossJoin(svSide)
      .groupBy(col("__fid"), col("__fy"))
      .agg(sum(col("sv_coef") * kernel(col("sv_x"), col("__fx"))).as("__s"))
      .agg(avg(col("__fy") - col("__s")).as("b"))
      .head()
    val bias = if (biasRow.isNullAt(0)) 0.0 else biasRow.getDouble(0)

    joined.unpersist()
    IcfSvmModel(kernel, svDf, nSv, bias)
  }
}
