package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GraftFunctions, VectorOps}

/** §2.3 P7c: product-quantization ANN (asymmetric distance computation
  * with exact re-ranking) — the third scale path next to [[LshAnn]] and
  * [[IvfAnn]], and the standard COMPRESSION layout for billion-vector
  * corpora: each vector is stored as `m` small codebook indices instead
  * of `dim` floats (here 4 bytes-worth vs 64 floats, a 64× shuffle and
  * memory reduction on the corpus side).
  *
  * Training: the vector space is split into `m` contiguous subspaces;
  * a seeded k-means per subspace learns a `k`-codeword codebook.
  * Encoding is a narrow map (nearest codeword per subspace). Scoring is
  * ADC: per query, ONE m×k lookup table of subspace distances is built
  * as a column expression, and each candidate costs m `element_at`
  * lookups — O(m) per pair instead of O(dim), with every term a builtin
  * codegen expression (the m-term sum is unrolled, no interpreted HOF).
  * The ADC top-`rerank` shortlist is re-ranked with the exact fused
  * cosine, the standard PQ + re-ranking pipeline.
  *
  * Scale shape: codebooks are driver-side m×k×(dim/m) literals (tiny by
  * design); encoding and table-building are per-row maps; the only
  * shuffle is the per-query top-k window. Approximate by design →
  * rows-only with measured recall (like p7/p7b), fail-fast below floor.
  */
object PqAnn {

  /** Per-subspace seeded k-means codebooks: m × k × (dim/m). */
  def fitCodebooks(df: DataFrame, vecCol: String, m: Int, k: Int,
                   seed: Long = 42L, maxIter: Int = 10): Array[Array[Array[Double]]] = {
    val v = df.select(VectorOps.toDoubleArray(col(vecCol)).as("v"))
    val dim = v.head().getSeq[Double](0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).toArray.map { s =>
      val feats = v.select(
        array_to_vector(slice(col("v"), s * sub + 1, sub)).as("features"))
      new KMeans().setK(k).setSeed(seed + s).setMaxIter(maxIter)
        .setFeaturesCol("features")
        .fit(feats).clusterCenters.map(_.toArray)
    }
  }

  private def cwLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** PQ code of a vector: m nearest-codeword indices (0-based). */
  def encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    array((0 until m).map { s =>
      val d = array(codebooks(s).map(cw =>
        GraftFunctions.sq_distance(slice(vec, s * sub + 1, sub), cwLit(cw))): _*)
      (array_position(d, array_min(d)) - 1).cast("int")
    }: _*)
  }

  /** Per-query ADC table: flat array of m·k squared distances from each
    * query subvector to each codeword. */
  private def adcTable(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val sub = codebooks(0)(0).length
    array(codebooks.zipWithIndex.flatMap { case (cws, s) =>
      cws.map(cw =>
        GraftFunctions.sq_distance(slice(vec, s * sub + 1, sub), cwLit(cw)))
    }: _*)
  }

  /** Unrolled ADC distance: Σ_s table[s·k + code[s]] — m element_at
    * lookups, all codegen. */
  private def adcDist(tab: Column, codes: Column, m: Int, k: Int): Column =
    (0 until m).map(s =>
      element_at(tab, element_at(codes, s + 1) + lit(s * k) + 1)).reduce(_ + _)

  /** Approximate top-k neighbors per query: ADC shortlist → exact
    * cosine re-rank. */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, m: Int = 4, kCode: Int = 16,
              rerank: Int = 50, seed: Long = 42L): DataFrame = {
    val codebooks = fitCodebooks(corpus, vecCol, m, kCode, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        VectorOps.toDoubleArray(col(vecCol)).as("nvec"))
      .withColumn("codes", encode(col("nvec"), codebooks))
    val q = queries.select(col(idCol).as("query_id"),
        VectorOps.toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("tab", adcTable(col("qvec"), codebooks))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcDist(col("tab"), col("codes"), m, kCode))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= rerank)          // compressed-domain shortlist
      .withColumn("cos", GraftFunctions.cosine_sim(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** p7c: PQ top-10 for the first 5 vectors (rows-only — approximate by
    * design), annotated with measured recall vs the exact top-k and
    * failing fast below the floor. The floor is modest for the same
    * near-random-corpus reason as p7/p7b; the spec pins recall 1.0 for
    * planted identical twins (whose PQ codes coincide exactly). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 5)
    AnnRecall.annotate(
        annTopK(e, q, "vec_id", "embedding", 10),
        e, q, "vec_id", "embedding", 10,
        minRecall = 0.2, label = "p7c_ann_pq")
      .orderBy($"query_id", $"rank")
  }
}
