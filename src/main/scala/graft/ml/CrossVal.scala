package graft.ml

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** m12: k-fold cross-validated grid search — the reference ecosystem's
  * standard hyper-parameter workflow (libsvm's grid search over C,
  * driven here over the regularization grid of the Nyström-LinearSVC
  * trainer).
  *
  * Fold assignment is content-addressed (md5 of the row key), so folds
  * are stable under repartitioning/retries and exactly replayable.
  * The Nyström feature map is fit ONCE on the full training pool and
  * shared across all (param, fold) fits — the map is label-free, and
  * sharing it keeps the grid cost at |grid|·|folds| linear fits over a
  * cached feature table instead of re-landmarking per cell; fits run
  * concurrently (they are independent), mirroring fitMulticlassModel.
  *
  * Rows-only by design (iterative fits are not SQL), but SELF-VALIDATING:
  * the query fails fast unless (a) every row lands in exactly one fold,
  * (b) every validation slice is non-empty, and (c) some grid cell's
  * TRAINING accuracy clears the majority-class baseline. The gate is on
  * training, not validation, deliberately: the synthetic labels carry no
  * signal (held-out accuracy ≈ chance is the CORRECT answer here), but a
  * working fit must still beat chance on its own training subset — that
  * separates "CV loop broken" from "nothing to learn".
  */
object CrossVal {

  /** Content-addressed fold assignment — the ONE definition both the
    * grid query and its oracle-checked m12b twin use (the SQL replay in
    * SparkEntry mirrors it; keep them in sync). */
  private def foldCol(folds: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("cv:"), col("vec_id").cast("string"))), 1, 8),
      16, 10).cast("long") % folds

  /** m12b: the fold assignment itself, oracle-checked — per (fold,
    * class-parity label) counts over the content-addressed md5 buckets.
    * This puts the deterministic half of the CV loop (the part that IS
    * SQL) under the hash gate, so the rows-only m12 grid runs on folds
    * the driver has independently verified. */
  def cvFoldsQuery(spark: SparkSession, dir: String, folds: Int = 3): DataFrame = {
    Tables.embeddings(spark, dir)
      .withColumn("fold", foldCol(folds))
      .withColumn("y", when(col("label") % 2 === 0, 1.0).otherwise(-1.0))
      .groupBy(col("fold"), col("y"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("fold"), col("y"))
  }

  def cvGridQuery(spark: SparkSession, dir: String,
                  folds: Int = 3, grid: Seq[Double] = Seq(1e-3, 1e-1),
                  numLandmarks: Int = 48, maxIter: Int = 8): DataFrame = {
    import spark.implicits._
    val data = Tables.embeddings(spark, dir)
      .withColumn("y", when(col("label") % 2 === 0, 1.0).otherwise(-1.0))
    val fold = foldCol(folds).cast("int")
    val map = Nystrom.fit(data, "vec_id", "embedding", Kernel.Rbf(0.05), numLandmarks)
    val feats = Nystrom.transform(data.withColumn("__fold", fold), "embedding", map, "__phi")
      .withColumn("__features", array_to_vector(col("__phi")))
      .withColumn("__label01", when(col("y") > 0, 1.0).otherwise(0.0))
      .select(col("__fold"), col("__features"), col("__label01"))
      .coalesce(1)
      .persist()
    val total = feats.count()
    val foldSizes = feats.groupBy(col("__fold")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(foldSizes.keys.forall(f => f >= 0 && f < folds) &&
            foldSizes.values.sum == total && foldSizes.size == folds,
      s"fold partition broken: $foldSizes over $total rows")
    // positives per fold: lets each cell be gated against ITS OWN train
    // subset's majority (a skewed fold can push a train subset's majority
    // below the pool's, and a constant predictor legitimately scores
    // exactly the subset majority)
    val posByFold = feats.filter(col("__label01") === 1.0)
      .groupBy(col("__fold")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val totalPos = posByFold.values.sum
    def trainMajority(heldOutFold: Int): Double = {
      val n = total - foldSizes(heldOutFold)
      val pos = totalPos - posByFold(heldOutFold)
      math.max(pos, n - pos).toDouble / n
    }

    val combos = for (reg <- grid; f <- 0 until folds) yield (reg, f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, combos.length))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val results =
      try {
        val futs = combos.map { case (reg, f) =>
          scala.concurrent.Future {
            val train = feats.filter(col("__fold") =!= f)
            val valid = feats.filter(col("__fold") === f)
            val m = new LinearSVC()
              .setFeaturesCol("__features").setLabelCol("__label01")
              .setRegParam(reg).setMaxIter(maxIter).setTol(1e-4)
              .setFitIntercept(true)
              .fit(train)
            def acc(df: DataFrame): (Long, Double) = {
              val a = m.transform(df).agg(
                count(lit(1)).as("n"),
                sum(when(col("prediction") === col("__label01"), 1L).otherwise(0L)).as("ok"))
                .head()
              (a.getLong(0), a.getLong(1).toDouble / a.getLong(0))
            }
            val (nTrain, trainAcc) = acc(train)
            val (nVal, valAcc) = acc(valid)
            (reg, f, nTrain, nVal, trainAcc, valAcc)
          }
        }
        futs.map(x =>
          scala.concurrent.Await.result(x, scala.concurrent.duration.Duration.Inf))
      } finally {
        pool.shutdown()
        feats.unpersist()
      }

    val byParam = results.groupBy(_._1).view.mapValues(rs =>
      rs.map(_._6).sum / rs.length).toMap
    val best = byParam.maxBy { case (reg, acc) => (acc, -reg) }
    require(results.forall(_._4 > 0), "empty validation fold")
    require(results.exists(r => r._5 >= trainMajority(r._2)),
      "no grid cell reaches even its own train-subset majority baseline in " +
        s"TRAINING (train accuracies: ${results.map(_._5).mkString(", ")}) — CV loop broken")

    results.sortBy(r => (r._1, r._2))
      .toDF("reg_param", "fold", "n_train", "n_val", "train_accuracy", "val_accuracy")
      .withColumn("train_accuracy", round(col("train_accuracy"), 6))
      .withColumn("val_accuracy", round(col("val_accuracy"), 6))
      .withColumn("is_best_param", col("reg_param") === best._1)
  }
}
