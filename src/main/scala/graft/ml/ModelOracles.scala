package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Driver-visible queries that make the PREDICT half of the ML surface
  * oracle-checkable (reference: psvm svm_predict.cc decision values).
  *
  * Training is iterative and seeded — not SQL — but a TRAINED model is
  * just data: (sv_x, sv_coef) rows + bias for the SV form, or
  * (landmarks, projection, weights, intercept) for the Nyström form. The
  * queries here fit once per (dataset, JVM), persist the model under a
  * FIXED path, reload it through the public load path, and score a
  * held-out slice with order-deterministic arithmetic; the DuckDB oracle
  * replays f(x) from the very same saved files with list-op kernel sums
  * (the sequential-double technique proven bit-exact by the m2/p5
  * queries). A green row therefore certifies save → load → score
  * end-to-end, not just "rows came back".
  */
object ModelOracles {

  /** Model root, SCOPED BY SF DIR: the oracle SQL names the sf0.01 path
    * statically (the driver's correctness gate always runs at sf0.01),
    * and scoping the writes by dataset means a bench run at another SF
    * can never clobber the files the verify oracles are about to read —
    * verify and bench become order-independent. (Verify runs the Spark
    * queries first, then the driver replays the oracle SQL — the files
    * are guaranteed present by then.) */
  def modelRoot(dir: String): String =
    s"/tmp/graft_models/${new java.io.File(dir).getName}"

  // one fit per (path-key, sf dir) per JVM: Verify and Bench each score
  // the same persisted model rather than re-fitting per query
  private val icfModels = new java.util.concurrent.ConcurrentHashMap[String, IcfSvmModel]()
  private val nysModels = new java.util.concurrent.ConcurrentHashMap[String, KernelSvmModel]()
  private val icfFactors = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** ±1 labels from label parity — the same derivation the m1/m5/m6
    * training queries use. */
  private def labeled(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("y", when(col("label") % 2 === 0, 1.0).otherwise(-1.0))

  /** Train slice: first 300 vectors (present at every sf). */
  private def trainSlice(spark: SparkSession, dir: String): DataFrame =
    labeled(spark, dir).filter(col("vec_id") < 300)

  /** Held-out scoring slice: vectors 300–399 — disjoint from training. */
  private def heldOut(spark: SparkSession, dir: String): DataFrame =
    labeled(spark, dir).filter(col("vec_id") >= 300 && col("vec_id") < 400)

  /** Fit + saveText + loadText an ICF-SVM model (fixed seed/params).
    * Returns the RELOADED model, so every downstream score certifies the
    * text round-trip. */
  def icfModel(spark: SparkSession, dir: String): IcfSvmModel =
    icfModels.computeIfAbsent(dir, _ => {
      val m = IcfSvmTrainer.fit(trainSlice(spark, dir), "vec_id", "embedding", "y",
        Kernel.Rbf(0.05), rank = 16, c = 5.0, maxIter = 40, tol = 1e-3)
      m.saveText(spark, s"${modelRoot(dir)}/m8_icf")
      m.unpersist()
      IcfSvmModel.loadText(spark, s"${modelRoot(dir)}/m8_icf")
    })

  /** Fit + save + load a Nyström kernel-SVM model (parquet form). */
  def nystromModel(spark: SparkSession, dir: String): KernelSvmModel =
    nysModels.computeIfAbsent(dir, _ => {
      // maxIter 10: the oracle replays whatever model got SAVED, so fit
      // quality doesn't affect correctness — half the OWLQN iterations
      // halves the query's fixed MLlib overhead (this was the bench's
      // most expensive new query at maxIter 20)
      val m = KernelSvmTrainer.fit(trainSlice(spark, dir), "vec_id", "embedding", "y",
        KernelSvmParams(kernel = Kernel.Rbf(0.05), numLandmarks = 64,
                        regParam = 1e-3, maxIter = 10, tol = 1e-4))
      m.save(spark, s"${modelRoot(dir)}/m10_nystrom")
      KernelSvmModel.load(spark, s"${modelRoot(dir)}/m10_nystrom")
    })

  /** ICF factor H (rank 8, first 200 vectors), persisted to the fixed
    * path and read BACK from parquet — both engines then score the
    * identical doubles. */
  def icfH(spark: SparkSession, dir: String): DataFrame =
    icfFactors.computeIfAbsent(dir, _ => {
      Icf.factorize(
          Tables.embeddings(spark, dir).filter(col("vec_id") < 200),
          "vec_id", "embedding", Kernel.Rbf(0.05), rank = 8)
        .write.mode("overwrite").parquet(s"${modelRoot(dir)}/m4_icf_h")
      spark.read.parquet(s"${modelRoot(dir)}/m4_icf_h")
    })

  /** Single-slot, last-dir-wins: file and in-memory (A, B) must move
    * together (the paths are now sf-scoped, but the slot also guards
    * against an interleaving refit racing the parquet write). */
  private val plattModel =
    new java.util.concurrent.atomic.AtomicReference[(String, Platt.PlattModel)]()

  /** m11: Platt probability calibration over the text-round-tripped
    * ICF-SVM model's decisions (the standard probabilistic-output layer
    * the reference's raw decision values feed into). The sigmoid (A, B)
    * is fit on the TRAINING slice with the distributed Newton solver and
    * persisted; held-out rows then carry calibrated P(y=+1). The oracle
    * replays every probability from the saved SV model + saved (A, B) —
    * fit quality never affects correctness, only the saved pair does. */
  def m11PlattProbs(spark: SparkSession, dir: String): DataFrame = {
    val model = icfModel(spark, dir)
    val pm = plattModel.get() match {
      case (d, m) if d == dir => m
      case _ => plattModel.synchronized {
        plattModel.get() match {
          case (d, m) if d == dir => m
          case _ =>
            val trainScored = model
              .predictOrdered(trainSlice(spark, dir), "vec_id", "embedding")
              .select(col("vec_id"), col("decision"), col("y"))
            val m = Platt.fit(trainScored, "decision", "y")
            import spark.implicits._
            Seq((m.a, m.b)).toDF("a", "b").coalesce(1)
              .write.mode("overwrite").parquet(s"${modelRoot(dir)}/m11_platt")
            plattModel.set((dir, m))
            m
        }
      }
    }
    model.predictOrdered(heldOut(spark, dir), "vec_id", "embedding")
      .select(col("vec_id"),
        round(col("decision"), 6).as("decision"),
        round(Platt.probability(col("decision"), pm), 6).as("prob_pos"),
        when(Platt.probability(col("decision"), pm) >= 0.5, 1.0).otherwise(-1.0)
          .as("prediction"))
      .orderBy(col("vec_id"))
  }

  /** m4c: the `rank_ratio` auto-rank path (psvm's flag: p = ⌈ratio·n⌉
    * capped, with residual early stop) made driver-visible — the chosen
    * rank and the whole-factor residuals, graded from the PERSISTED
    * factor exactly like m4b, so the early-stop logic itself is under
    * the oracle. */
  def m4cIcfAutoRank(spark: SparkSession, dir: String): DataFrame = {
    val h = icfFactors.computeIfAbsent(dir + "#auto", _ => {
      Icf.factorizeAuto(
          Tables.embeddings(spark, dir).filter(col("vec_id") < 200),
          "vec_id", "embedding", Kernel.Rbf(0.05),
          rankRatio = 0.08, maxRank = 12, residualTol = 1e-6)
        .write.mode("overwrite").parquet(s"${modelRoot(dir)}/m4c_icf_auto")
      spark.read.parquet(s"${modelRoot(dir)}/m4c_icf_auto")
    })
    val r = h.select(col("id"),
      org.apache.spark.sql.functions.size(col("icf_features")).cast("long").as("rank"),
      (lit(1.0) - graft.functions.GraftFunctions.dot_product(
        col("icf_features"), col("icf_features"))).as("res"))
    r.agg(
        count(lit(1)).as("n_rows"),
        max(col("rank")).as("chosen_rank"),
        round(max(col("res")), 6).as("max_diag_residual"),
        round(aggregate(
          transform(sort_array(collect_list(struct(col("id"), col("res")))),
            s => s.getField("res")),
          lit(0.0), (acc, x) => acc + x), 6).as("trace_residual"))
  }

  /** m8: per-row decision values of the text-round-tripped ICF-SVM model
    * on the held-out slice (M9 predict + M10 save/load). */
  def m8ModelScore(spark: SparkSession, dir: String): DataFrame = {
    val model = icfModel(spark, dir)
    model.predictOrdered(heldOut(spark, dir), "vec_id", "embedding")
      .select(col("vec_id"), round(col("decision"), 6).as("decision"),
              col("prediction"))
      .orderBy(col("vec_id"))
  }

  /** m9: held-out confusion matrix + metrics of the same model (M11). */
  def m9ModelEval(spark: SparkSession, dir: String): DataFrame = {
    val model = icfModel(spark, dir)
    SvmEvaluator.evaluate(
      model.predictOrdered(heldOut(spark, dir), "vec_id", "embedding"), "y")
  }

  /** m10: per-row decisions of the parquet-round-tripped Nyström model —
    * the oracle replays φ(x) = Wᵀ[k(x,l₁)…k(x,lₘ)] and w·φ(x)+b from the
    * saved landmark/projection/params files. */
  def m10NystromScore(spark: SparkSession, dir: String): DataFrame = {
    val model = nystromModel(spark, dir)
    model.predict(heldOut(spark, dir), "embedding")
      .select(col("vec_id"), round(col("decision"), 6).as("decision"),
              col("prediction"))
      .orderBy(col("vec_id"))
  }

  /** m4 (rewritten): ICF reconstruction quality on a pair grid — exact
    * kernel values recomputed from the raw embeddings (non-circular)
    * against ⟨h_i, h_j⟩ from the persisted factor. */
  def m4IcfFactor(spark: SparkSession, dir: String): DataFrame = {
    val h = icfH(spark, dir)
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
      .select(col("vec_id"), VectorOps.toDoubleArray(col("embedding")).as("x"))
    val a = e.select(col("vec_id").as("id_a"), col("x").as("xa"))
      .join(h.select(col("id").as("id_a"), col("icf_features").as("ha")), Seq("id_a"))
    val b = e.select(col("vec_id").as("id_b"), col("x").as("xb"))
      .join(h.select(col("id").as("id_b"), col("icf_features").as("hb")), Seq("id_b"))
    val kernel = Kernel.Rbf(0.05)
    a.join(b, col("id_a") <= col("id_b"))
      .withColumn("__ke", kernel(col("xa"), col("xb")))
      .withColumn("__ki", graft.functions.GraftFunctions.dot_product(col("ha"), col("hb")))
      .select(col("id_a"), col("id_b"),
        round(col("__ke"), 6).as("k_exact"),
        round(col("__ki"), 6).as("k_icf"),
        round(abs(col("__ke") - col("__ki")), 6).as("abs_err"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** m4b: whole-factor residual summary — max and (id-ordered, so
    * order-deterministic) trace of the diagonal residual
    * k(x_i,x_i) − ‖h_i‖² = 1 − ‖h_i‖² for RBF. */
  def m4bIcfResiduals(spark: SparkSession, dir: String): DataFrame = {
    val h = icfH(spark, dir)
    val r = h.select(col("id"),
      (lit(1.0) - graft.functions.GraftFunctions.dot_product(
        col("icf_features"), col("icf_features"))).as("res"))
    r.agg(
        count(lit(1)).as("n_rows"),
        round(max(col("res")), 6).as("max_diag_residual"),
        round(aggregate(
          transform(sort_array(collect_list(struct(col("id"), col("res")))),
            s => s.getField("res")),
          lit(0.0), (acc, x) => acc + x), 6).as("trace_residual"))
  }
}
