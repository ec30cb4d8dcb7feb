package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Platt scaling: fit a sigmoid P(y=+1|f) = 1 / (1 + exp(A·f + B)) over
  * a classifier's decision values (Platt 1999, with the Newton/backtrack
  * refinements of Lin–Lin–Weng 2007). The reference's predict path emits
  * raw decision values only; this adds the standard probability
  * calibration layer on top — the fitted (A, B) pair is data, so scoring
  * stays oracle-checkable even though the fit is iterative.
  *
  * Scale shape: the driver holds exactly two scalars (A, B); every
  * Newton step is ONE distributed aggregate over the (decision, target)
  * table, plus one per accepted/rejected backtrack step — the same
  * bounded-driver-state pattern as [[Ipm]]. No decision values are ever
  * collected.
  */
object Platt {

  final case class PlattModel(a: Double, b: Double)

  /** Fit on a scored DataFrame: `decisionCol` (double) + `labelCol`
    * (±1). Uses Platt's smoothed targets t⁺=(N⁺+1)/(N⁺+2), t⁻=1/(N⁻+2)
    * and Newton iterations with backtracking line search on the
    * cross-entropy objective.
    *
    * Default tol 1e-4 on the gradient: with 6-decimal-rounded
    * probability outputs, tightening further buys digits the output
    * can't express — on noisy labels (a flat objective) the 1e-5 tail
    * alone doubled the iteration count. Correctness never depends on
    * convergence anyway: the oracle replays whatever (A, B) got SAVED. */
  def fit(scored: DataFrame, decisionCol: String, labelCol: String,
          maxIter: Int = 25, minStep: Double = 1e-10,
          sigma: Double = 1e-12, tol: Double = 1e-4): PlattModel = {
    val base = scored.select(
      col(decisionCol).cast("double").as("f"),
      col(labelCol).cast("double").as("y"))
    val counts = base.agg(
      sum(when(col("y") > 0, 1L).otherwise(0L)).as("np"),
      sum(when(col("y") <= 0, 1L).otherwise(0L)).as("nn")).head()
    val nPos = counts.getLong(0).toDouble
    val nNeg = counts.getLong(1).toDouble
    val hi = (nPos + 1.0) / (nPos + 2.0)
    val lo = 1.0 / (nNeg + 2.0)
    // Calibration sets are bounded by design (a sampled slice, not the
    // corpus), but the scored table arrives 32-way partitioned from the
    // upstream shuffle — at ~10 aggregate jobs per Newton step, empty
    // task overhead would dominate. Compact like Ipm does (~50k
    // rows/partition) instead of assuming small.
    val parts = math.max(1, math.min(base.rdd.getNumPartitions,
      ((nPos + nNeg).toLong / 50000L).toInt + 1))
    val df = base
      .withColumn("t", when(col("y") > 0, hi).otherwise(lo))
      .coalesce(parts)
      .persist()
    df.count()

    def fApB(a: Double, b: Double): Column = col("f") * a + lit(b)

    // numerically-stable cross-entropy: branch on the sign of A·f+B
    def objective(a: Double, b: Double): Double = {
      val z = fApB(a, b)
      df.agg(sum(
        when(z >= 0, col("t") * z + log1p(exp(-z)))
          .otherwise((col("t") - 1.0) * z + log1p(exp(z))))).head().getDouble(0)
    }

    var a = 0.0
    var b = math.log((nNeg + 1.0) / (nPos + 1.0))
    var fv = objective(a, b)
    var it = 0
    var nObjEvals = 1
    var converged = false
    while (it < maxIter && !converged) {
      val z = fApB(a, b)
      // stable p = 1/(1+exp(z)) … expressed to avoid overflow either side
      val p = when(z >= 0, exp(-z) / (exp(-z) + 1.0))
        .otherwise(lit(1.0) / (lit(1.0) + exp(z)))
      val d1 = col("t") - p
      val d2 = p * (lit(1.0) - p)
      val g = df.agg(
        sum(col("f") * d1).as("g1"), sum(d1).as("g2"),
        sum(col("f") * col("f") * d2).as("h11"),
        sum(d2).as("h22"), sum(col("f") * d2).as("h21")).head()
      val (g1, g2) = (g.getDouble(0), g.getDouble(1))
      if (math.abs(g1) < tol && math.abs(g2) < tol) converged = true
      else {
        val h11 = g.getDouble(2) + sigma
        val h22 = g.getDouble(3) + sigma
        val h21 = g.getDouble(4)
        val det = h11 * h22 - h21 * h21
        // Newton direction on the NEGATIVE gradient (obj uses t−p form)
        val dA = -(h22 * g1 - h21 * g2) / det
        val dB = -(-h21 * g1 + h11 * g2) / det
        val gd = g1 * dA + g2 * dB
        var step = 1.0
        var accepted = false
        while (step >= minStep && !accepted) {
          val na = a + step * dA
          val nb = b + step * dB
          val nf = objective(na, nb)
          nObjEvals += 1
          if (nf < fv + 1e-4 * step * gd) {
            a = na; b = nb; fv = nf; accepted = true
          } else step = step / 2.0
        }
        if (!accepted) converged = true // line search failed: at optimum
      }
      it += 1
    }
    df.unpersist()
    PlattModel(a, b)
  }

  /** Probability column for a decision column under a fitted model. */
  def probability(decision: Column, m: PlattModel): Column =
    lit(1.0) / (lit(1.0) + exp(decision * m.a + lit(m.b)))
}
