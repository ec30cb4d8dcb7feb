package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** SparkEntry wrappers for the §2.1 ML surface over the embeddings table. */
object MlQueries {

  /** m2: the four kernel values over a fixed pair grid (oracle-checked —
    * the kernels are plain double math DuckDB can mirror). */
  def kernelValues(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", VectorOps.toDoubleArray($"embedding").as("v"))
    val a = e.filter($"vec_id" < 3)
      .select($"vec_id".as("id_a"), $"v".as("va"))
    val b = e.filter($"vec_id".between(3, 8))
      .select($"vec_id".as("id_b"), $"v".as("vb"))
    a.join(b)
      .select($"id_a", $"id_b",
        round(Kernel.Linear($"va", $"vb"), 6).as("k_linear"),
        round(Kernel.Polynomial(0.01, 1.0, 2)($"va", $"vb"), 6).as("k_poly"),
        round(Kernel.Rbf(0.1)($"va", $"vb"), 6).as("k_rbf"),
        round(Kernel.Laplacian(0.1)($"va", $"vb"), 6).as("k_laplacian"))
      .orderBy($"id_a", $"id_b")
  }

  /** m7: LIBSVM text round-trip (reference: psvm document.cc reader) —
    * embeddings are written as `label idx:val …` lines, read back through
    * the distributed libsvm source, and summarized; the oracle computes
    * the same summary straight from the parquet table, so any
    * serialization loss would hash-mismatch. */
  def libsvmRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("double").as("label"),
              VectorOps.toDoubleArray($"embedding").as("vec"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_libsvm").toString
    LibSvmIO.write(e, "label", "vec", tmp)
    val out = LibSvmIO.read(spark, tmp)
      .groupBy($"label")
      .agg(count(lit(1)).as("n_rows"),
           round(sum(aggregate($"features", lit(0.0), (acc, x) => acc + x)), 6)
             .as("feature_mass"))
      .orderBy($"label")
    // materialize the tiny summary, then drop the temp round-trip files
    // so repeated verify/bench runs don't accumulate disk
    val rows = out.collect()
    val res = spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    graft.operators.ScaleOps.deleteRecursively(tmp)
    res
  }

  /** m1: end-to-end binary kernel SVM — train on embeddings with ±1
    * labels (label parity), persist the model, score the training set
    * with the RELOADED model, emit the confusion matrix + metrics.
    *
    * The iterative fit itself isn't SQL, but the fitted model is just
    * data — the query saves it under a fixed path and the DuckDB oracle
    * replays φ(x) = Wᵀ[k(x,lᵢ)] and w·φ(x)+b from the very same files
    * (the m10 technique), then recomputes the confusion matrix, so the
    * whole predict+persist+eval half is hash-verified. */
  def svmBinaryEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = Tables.embeddings(spark, dir)
      .withColumn("y", when($"label" % 2 === 0, 1.0).otherwise(-1.0))
    val fitted = KernelSvmTrainer.fit(data, "vec_id", "embedding", "y",
      KernelSvmParams(kernel = Kernel.Rbf(0.05), numLandmarks = 64,
                      regParam = 1e-3, maxIter = 10, tol = 1e-4))
    fitted.save(spark, s"${ModelOracles.modelRoot(dir)}/m1_nystrom")
    val model = KernelSvmModel.load(spark, s"${ModelOracles.modelRoot(dir)}/m1_nystrom")
    SvmEvaluator.evaluate(model.predict(data, "embedding"), "y")
  }

  /** m3: one-vs-rest multiclass over the 10 labels; per-class accuracy.
    * The OVR model (shared Nyström map + per-class classifiers) persists
    * under the fixed model root and the summary is computed from the
    * RELOADED model's deterministic argmax scoring, so the DuckDB oracle
    * replays every per-class decision and the argmax from the saved
    * files — predict/persist/eval hash-verified like m1/m5/m6. */
  def svmMulticlassEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = Tables.embeddings(spark, dir)
    val fitted = KernelSvmTrainer.fitMulticlassModel(data, "vec_id", "embedding", "label",
      KernelSvmParams(kernel = Kernel.Rbf(0.05), numLandmarks = 64,
                      regParam = 1e-3, maxIter = 10, tol = 1e-4))
    fitted.save(spark, s"${ModelOracles.modelRoot(dir)}/m3_ovr")
    val model = MulticlassKernelSvmModel.load(spark, s"${ModelOracles.modelRoot(dir)}/m3_ovr")
    model.predict(data, "embedding")
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
           sum(when($"prediction_class" === $"label".cast("double"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("class_accuracy", round($"n_correct" / $"n", 6))
      .orderBy($"label")
  }

  /** m5: the exact-IPM training path end-to-end (reference ipm.cc):
    * Nyström features → SMW interior-point dual solve → primal recovery
    * → persist → reload → confusion matrix. Oracle-checked the same way
    * as m1: DuckDB rescores every row from the saved model files. */
  def svmIpmEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = Tables.embeddings(spark, dir)
      .withColumn("y", when($"label" % 2 === 0, 1.0).otherwise(-1.0))
    val fitted = KernelSvmTrainer.fitIpm(data, "vec_id", "embedding", "y",
      KernelSvmParams(kernel = Kernel.Rbf(0.05), numLandmarks = 32, tol = 1e-4),
      c = 5.0, maxIter = 60)
    fitted.save(spark, s"${ModelOracles.modelRoot(dir)}/m5_ipm")
    val model = KernelSvmModel.load(spark, s"${ModelOracles.modelRoot(dir)}/m5_ipm")
    SvmEvaluator.evaluate(model.predict(data, "embedding"), "y")
  }

  /** m6: the unabridged reference pipeline — greedy ICF of the RBF
    * kernel → SMW-IPM dual solve → support-vector model scored with the
    * original kernel, over the FULL embeddings table (the early rounds
    * capped this at 500 vectors; the fused IPM passes pay for the full
    * width). The SV model round-trips through the psvm-style text format
    * and the oracle replays every decision from the saved SV lines. */
  def svmIcfIpmEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = Tables.embeddings(spark, dir)
      .withColumn("yy", when($"label" % 2 === 0, 1.0).otherwise(-1.0))
    val fitted = IcfSvmTrainer.fit(data, "vec_id", "embedding", "yy",
      Kernel.Rbf(0.05), rank = 16, c = 5.0, maxIter = 40, tol = 1e-3)
    fitted.saveText(spark, s"${ModelOracles.modelRoot(dir)}/m6_icf")
    fitted.unpersist()
    val model = IcfSvmModel.loadText(spark, s"${ModelOracles.modelRoot(dir)}/m6_icf")
    // Scoring: predictQuantized — floor-picounit contributions, INTEGER
    // per-row sums (order-independent, so DuckDB replays the decisions
    // bit-exactly from the saved text model with one GROUP BY, and the
    // SV side streams as broadcast chunks — no n·nSV shuffle). The
    // earlier predictOrdered fold collected + sorted nSV contributions
    // PER ROW: measured disk-filling at the 100× decade, where the
    // non-separable fit makes every row a support vector (200k × 200k).
    // Evaluation scores a DETERMINISTIC 1-in-10 sample: exact-kernel
    // SV scoring is inherently O(n_eval·nSV) — psvm's svm_predict pays
    // the same per test row — so the driver row bounds n_eval; the
    // operator is unchanged (score everything = the same call without
    // the filter, at 10× the pairs). The sample is HASH-based (md5 of
    // the id, the p16 bucket idiom — not raw id modulo, which is safe
    // only while ids stay uncorrelated with labels), and the result row
    // carries n_eval so the sampling scope is visible in the artifact.
    val evalRows = data.filter(
      conv(substring(md5($"vec_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 === 0)
    SvmEvaluator.evaluate(model.predictQuantized(evalRows, "vec_id", "embedding"), "yy")
      .withColumn("n_eval", ($"tp" + $"fp" + $"tn" + $"fn").cast("long"))
      .withColumn("n_support_vectors", lit(model.numSupportVectors))
  }

}
