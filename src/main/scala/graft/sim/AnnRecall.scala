package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall instrumentation for the approximate-NN paths: every ANN driver
  * query reports its measured recall against the exact top-k IN the
  * result rows, and fails fast when recall drops below a floor — so the
  * correctness gate sees the approximation quality directly instead of
  * trusting a spec that ran elsewhere.
  *
  * Cost: one brute-force pass for the (bounded, broadcast) query set —
  * the same work [[Knn.bruteForce]] does, acceptable for a bounded query
  * panel; production corpora validate on a sampled panel exactly like
  * this. */
object AnnRecall {

  /** Join per-query recall vs the exact top-k onto `approx`
    * (query_id, neighbor_id, rank, cos_sim) and enforce `minRecall`.
    * Adds columns: k, exact_overlap, recall.
    *
    * `floorOnMean`: enforce the floor on the MEAN recall across the
    * query panel instead of the per-query min. On a near-random corpus
    * an IVF-pruned path's per-query recall is ~binomial(k, nprobe/nlist)
    * — the min over even a handful of queries hits 1/k by pure chance as
    * the corpus grows (observed: p7d min-recall 0.1 at the 100× decade
    * with perfectly healthy cells), while the mean over a 20-query panel
    * concentrates tightly; a mean floor is the structural-zero tripwire
    * (broken cell assignment/codes → ~0), not a variance lottery. */
  def annotate(approx: DataFrame, corpus: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int,
               minRecall: Double, label: String,
               floorOnMean: Boolean = false): DataFrame = {
    val exact = Knn.bruteForce(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val overlap = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "leftsemi")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("exact_overlap"))
    val out = approx
      .join(overlap, Seq("query_id"), "left")
      .withColumn("exact_overlap", coalesce(col("exact_overlap"), lit(0L)))
      .withColumn("k", lit(k.toLong))
      .withColumn("recall", round(col("exact_overlap").cast("double") / k, 6))
    // fail fast: a silent recall collapse must not pass as "rows > 0"
    val agged = out.select(col("query_id"), col("recall")).distinct()
      .agg(min(col("recall")), avg(col("recall"))).head()
    val seen =
      if (agged.isNullAt(0)) 0.0
      else if (floorOnMean) agged.getDouble(1) else agged.getDouble(0)
    require(seen >= minRecall,
      s"$label ${if (floorOnMean) "mean " else ""}recall $seen below floor " +
      s"$minRecall — index/banding regressed")
    out
  }
}
