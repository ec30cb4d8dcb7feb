package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-timing probe (not part of the library surface). */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.MinHashDedup
    import graft.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = Tables.documents(spark, dir)
    val sets = docs.select(col("doc_id").as("id"),
      MinHashDedup.shingles(col("text"), 3).as("sh")).cache()
    time("shingles")(sets.count())
    val sigs = sets.select(col("id"), MinHashDedup.signature(col("sh")).as("sig")).cache()
    time("signatures")(sigs.count())
    val bands = sigs.select(col("id"),
        posexplode(MinHashDedup.bandKeys(col("sig"))))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("band_key")).cache()
    time("bands")(bands.count())
    val pairs = bands.select(col("id").as("id_a"), col("band_idx"), col("band_key"))
      .join(bands.select(col("id").as("id_b"), col("band_idx"), col("band_key")),
            Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates().cache()
    val nPairs = time("candidate pairs")(pairs.count())
    System.err.println(s"[t] n candidate pairs = $nPairs")
    val verified = pairs
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", MinHashDedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.8)
    val nVer = time("verified")(verified.count())
    System.err.println(s"[t] n verified pairs = $nVer")

    import graft.dedup.NgramJaccard
    val nsets = docs.select(col("doc_id").as("id"),
      NgramJaccard.charNgrams(col("text"), 3).as("sh")).cache()
    time("char ngram sets")(nsets.count())
    val npairs = time("ngram candidates")(MinHashDedup.candidatePairsBySets(nsets).count())
    System.err.println(s"[t] ngram candidates = $npairs")
    spark.stop()
  }
}
