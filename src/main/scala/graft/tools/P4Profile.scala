package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the p4 char-ngram LSH pipeline. */
object P4Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[p4] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    import graft.dedup.{MinHashDedup, NgramJaccard}
    val docs = graft.Tables.documents(spark, dir)
    time("warmup count")(docs.count())
    val sets = docs.select(col("doc_id").as("id"),
      NgramJaccard.charNgrams(col("text"), 3).as("sh"))
    time("ngrams only")(sets.select(sum(size(col("sh")))).head())
    val hashed = sets.select(col("id"),
      array_distinct(transform(col("sh"), x => xxhash64(x))).as("sh"))
    time("ngrams+hash")(hashed.select(sum(size(col("sh")))).head())
    val cached = hashed.persist()
    time("cache build")(cached.count())
    val banded = cached
      .select(col("id"), posexplode(MinHashDedup.bandKeys(col("sh"), 8, 8)))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("band_key"))
    time("band keys")(banded.count())
    val pairs = banded.groupBy("band_idx", "band_key")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 200))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val np = time("bucket pairs")(pairs.count())
    System.err.println(s"[p4] candidate pairs: $np")
    val verified = pairs
      .join(cached.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(cached.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(MinHashDedup.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= 0.9)
    time("verify")(verified.count())
    time("full query")(NgramJaccard.query(spark, dir).count())
    spark.stop()
  }
}
