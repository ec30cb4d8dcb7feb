package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** §2.3 P5: embedding-cosine near-duplicate pairs.
  *
  * This is the EXACT all-pairs variant (O(n²) over ids, kept for the
  * oracle-checked query and for modest candidate sets). At 100 TB the
  * scale path is [[graft.sim.LshAnn]] — random-hyperplane bucketing cuts
  * the cross product to per-bucket blocks; this same verification
  * (sequential-double cosine ≥ τ) then runs inside each bucket.
  */
object EmbeddingDedup {

  /** All pairs (id_a < id_b) with cosine ≥ threshold. Cosine is computed
    * as sequential double accumulation so the DuckDB oracle bit-matches. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    // norms are hoisted to the per-side projections: computed n times
    // instead of n² times, and bit-identical to computing them per pair
    // (same doubles, same sequential sum), so the oracle still matches.
    val v = df.select(col(idCol).as("id"),
                      VectorOps.toDoubleArray(col(vecCol)).as("vec"))
      .withColumn("nrm", VectorOps.norm(col("vec")))
    val a = v.select(col("id").as("id_a"), col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = v.select(col("id").as("id_b"), col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.functions.GraftFunctions.dot_product(col("vec_a"), col("vec_b")) /
          (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
  }

  /** p5: near-dup embedding pairs at τ=0.4 (oracle-checked). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    nearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.4)
      .orderBy($"id_a", $"id_b")
  }
}
