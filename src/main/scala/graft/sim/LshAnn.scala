package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps

/** §2.3 P7: LSH-bucketed approximate nearest neighbors.
  *
  * Random-hyperplane (sign) LSH with OR-amplification: `numTables`
  * independent tables of `planesPerTable` hyperplanes each. A corpus
  * vector is a candidate for a query iff they share a bucket in ANY
  * table. Exact sequential-double cosine then ranks the candidates.
  *
  * Hyperplanes are generated from a fixed seed — deterministic across
  * runs and engines, no data pass needed.
  *
  * Scale: signatures are one linear pass (broadcastable literal planes,
  * codegen'd dot products). The bucket join shuffles on (table, key);
  * buckets are balanced for near-random data, and skewed buckets can be
  * salted or capped. This replaces the O(n²) cross product of brute
  * force with O(n · avg-bucket-size).
  */
object LshAnn {

  /** Deterministic Gaussian hyperplanes: tables × planes × dim. */
  def hyperplanes(numTables: Int, planesPerTable: Int, dim: Int,
                  seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numTables)(Seq.fill(planesPerTable)(Array.fill(dim)(rng.nextGaussian())))
  }

  private def planeLit(p: Array[Double]): Column = array(p.map(lit): _*)

  /** Per-table bucket key: planesPerTable sign bits packed into a long. */
  def bucketKey(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(graft.functions.GraftFunctions.dot_product(vec, planeLit(p)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Attach (table_idx, bucket_key) rows, exploded. */
  private def withBuckets(df: DataFrame, vecCol: String,
                          tables: Seq[Seq[Array[Double]]]): DataFrame =
    df.select(col("*"),
        posexplode(array(tables.map(t => bucketKey(col(vecCol), t)): _*)))
      .withColumnRenamed("pos", "table_idx")
      .withColumnRenamed("col", "bucket_key")

  /** Approximate top-k neighbors per query via shared LSH buckets. */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numTables: Int = 8,
              planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val tables = hyperplanes(numTables, planesPerTable, dim)
    val c = withBuckets(
      corpus.select(col(idCol).as("neighbor_id"),
                    VectorOps.toDoubleArray(col(vecCol)).as("nvec")), "nvec", tables)
    val q = withBuckets(
      queries.select(col(idCol).as("query_id"),
                     VectorOps.toDoubleArray(col(vecCol)).as("qvec")), "qvec", tables)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("table_idx", "bucket_key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", graft.functions.GraftFunctions.cosine_sim(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** p7: approximate top-10 for the first 5 vectors (rows-only — the
    * LSH bucketing isn't SQL-mirrorable), ANNOTATED with measured recall
    * vs the exact top-k and failing fast below the floor. The floor is
    * deliberately modest: this corpus's embeddings are near-random
    * (cosines ≈ 0), the adversarial regime for sign-LSH — real near-dup
    * corpora sit far above it (the spec asserts ≈1.0 on planted
    * neighbors). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 5)
    AnnRecall.annotate(
        annTopK(e, q, "vec_id", "embedding", 10),
        e, q, "vec_id", "embedding", 10,
        minRecall = 0.2, label = "p7_ann_lsh")
      .orderBy($"query_id", $"rank")
  }
}
