package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GraftFunctions, VectorOps}

/** §2.3 P7b: IVF (inverted-file) approximate nearest neighbors — the
  * second scale path next to [[LshAnn]], and the standard ANN layout for
  * billion-vector corpora.
  *
  * A coarse quantizer (distributed k-means, seeded → deterministic)
  * partitions the corpus into `nlist` cells; each vector is stored under
  * its nearest centroid (the "inverted file"). A query probes only its
  * `nprobe` closest cells and ranks those candidates with the exact
  * fused cosine. Recall is governed by nprobe/nlist; cost drops from
  * O(n) per query to O(n·nprobe/nlist).
  *
  * Scale shape: centroids are a driver-side nlist×dim matrix embedded as
  * literals (nlist is small by design); cell assignment is one narrow
  * codegen'd map; the candidate join shuffles on cell id — at 100 TB the
  * corpus side would be written bucketed/partitioned BY cell so probes
  * touch only matching files (partition pruning), which is exactly how
  * disk-resident IVF indexes lay out postings.
  */
object IvfAnn {

  /** Seeded distributed k-means over the vector column. */
  def fitCentroids(df: DataFrame, vecCol: String, nlist: Int,
                   seed: Long = 42L, maxIter: Int = 20): Array[Array[Double]] = {
    val feats = df.select(
      array_to_vector(VectorOps.toDoubleArray(col(vecCol))).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
    km.fit(feats).clusterCenters.map(_.toArray)
  }

  private def centroidLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** Array of squared distances to every centroid (fused exprs). */
  private[graft] def distances(vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map(c => GraftFunctions.sq_distance(vec, centroidLit(c))): _*)

  /** Index of the nearest centroid (0-based). */
  def cellOf(vec: Column, centroids: Array[Array[Double]]): Column = {
    val d = distances(vec, centroids)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** The `nprobe` nearest cell ids, from the distance array. */
  private[graft] def probeCellsCol(dCol: Column, nlist: Int, nprobe: Int): Column = {
    // sort (distance, idx) pairs, take nprobe, project idx
    val zipped = arrays_zip(dCol.as("d"), sequence(lit(0), lit(nlist - 1)).as("i"))
    transform(slice(array_sort(zipped), 1, nprobe), p => p.getField("i"))
  }

  /** Approximate top-k neighbors per query via IVF cell probing. */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L): DataFrame = {
    val centroids = fitCentroids(corpus, vecCol, nlist, seed)
    val c = corpus
      .select(col(idCol).as("neighbor_id"),
              VectorOps.toDoubleArray(col(vecCol)).as("nvec"))
      .withColumn("cell", cellOf(col("nvec"), centroids))
    val q = queries
      .select(col(idCol).as("query_id"),
              VectorOps.toDoubleArray(col(vecCol)).as("qvec"))
      .withColumn("cell",
        explode(probeCellsCol(distances(col("qvec"), centroids), nlist, nprobe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", GraftFunctions.cosine_sim(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** p7b: IVF top-10 for the first 5 vectors (rows-only — like p7, the
    * index is engine-specific), annotated with measured recall vs the
    * exact top-k and failing fast below the floor (modest here for the
    * same near-random-corpus reason as p7; the spec asserts 1.0 on
    * clustered fixtures where IVF's cell structure matches the data). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 5)
    AnnRecall.annotate(
        annTopK(e, q, "vec_id", "embedding", 10),
        e, q, "vec_id", "embedding", 10,
        minRecall = 0.2, label = "p7b_ann_ivf")
      .orderBy($"query_id", $"rank")
  }
}
