package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P4: character n-gram Jaccard similarity.
  *
  * Same LSH machinery as MinHash dedup but over character 3-grams, which
  * catches near-dups with small in-word edits that token shingles miss.
  */
object NgramJaccard {

  /** Distinct character n-grams of a string (whole string when shorter). */
  def charNgrams(text: Column, n: Int = 3): Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length(text) - ${n - 1}, 1)), " +
      s"i -> substring(text, i, $n))"))

  /** LSH candidates over char-ngram sets, verified with exact Jaccard.
    *
    * Char n-gram sets overlap far more than token shingles (every doc in
    * a domain shares most trigrams), so the banding is much stricter
    * than P2's: 4 bands × 16 rows (collision ≈ j^16 per band) plus a
    * bucket-size cap — boilerplate-heavy corpora otherwise go quadratic
    * in the candidate join. */
  def similarPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.9, n: Int = 3,
                   maxBucketSize: Int = 64): DataFrame = {
    val sets = df.select(col(idCol).as("id"), charNgrams(col(textCol), n).as("sh"))
    MinHashDedup.candidatePairsBySets(sets, bands = 4, rowsPerBand = 16,
        maxBucketSize = maxBucketSize)
      .withColumn("jaccard", round(MinHashDedup.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** p4: char-3-gram Jaccard near-dup pairs (rows-only check). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    similarPairs(Tables.documents(spark, dir), "doc_id", "text", 0.9)
      .orderBy($"id_a", $"id_b")
  }
}
