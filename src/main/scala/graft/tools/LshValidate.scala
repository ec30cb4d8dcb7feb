package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: Spark-side exact brute-force cross-check of the three LSH
  * dedup queries (p2/p3/p4) at any scale factor — confirms the banded
  * approximate pipelines return EXACTLY the all-pairs answer (the claim
  * the DuckDB oracles gate at sf0.01). */
object LshValidate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.{MinHashDedup, NgramJaccard, SimHashDedup}
    import graft.functions.HashFunctions

    val docs = graft.Tables.documents(spark, dir).persist()

    def exactPairs(shCol: org.apache.spark.sql.Column, tau: Double): Long = {
      val sets = docs.select(col("doc_id").as("id"),
        array_sort(array_distinct(transform(shCol, x => xxhash64(x)))).as("sh"))
      val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, col("id_a") < col("id_b"))
        .filter(MinHashDedup.jaccardSorted(col("sh_a"), col("sh_b")) >= tau)
        .count()
    }

    val p2Lsh = MinHashDedup.query(spark, dir).count()
    val p2Exact = exactPairs(MinHashDedup.shingles(col("text"), 3), 0.8)
    println(s"p2 lsh=$p2Lsh exact=$p2Exact match=${p2Lsh == p2Exact}")

    val p4Lsh = NgramJaccard.query(spark, dir).count()
    val p4Exact = exactPairs(NgramJaccard.charNgrams(col("text"), 3), 0.9)
    println(s"p4 lsh=$p4Lsh exact=$p4Exact match=${p4Lsh == p4Exact}")

    val p3Lsh = SimHashDedup.query(spark, dir).count()
    val sigs = docs.select(col("doc_id").as("id"),
      HashFunctions.simhash64(split(col("text"), "\\s+")).as("sig"))
    val p3Exact = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")),
            col("id_a") < col("id_b"))
      .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= 3)
      .count()
    println(s"p3 lsh=$p3Lsh exact=$p3Exact match=${p3Lsh == p3Exact}")
    spark.stop()
  }
}
