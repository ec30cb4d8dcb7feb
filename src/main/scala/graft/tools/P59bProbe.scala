package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: seed-vocabulary shape for the p59b prune-loop constants —
  * how many multi-char seed pieces survive MinSeedCount at sf0.01, and
  * how many singles, so SeedCap and the prune target can be chosen to
  * BIND on the fixture (a cap that never binds tests nothing). */
object P59bProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.text.UnigramLm

    val docWords = graft.Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", "\\s+")).as(Seq("pos", "word")))
      .filter(length($"word") > 0)
    val wordCnt = docWords.groupBy($"word").agg(count(lit(1)).as("wcnt")).persist()
    val wordChunks = wordCnt.select($"word").as[String].mapPartitions { it =>
      it.flatMap(w => UnigramLm.chunksOf(w).iterator.zipWithIndex.map { case (c, k) => (w, k, c) })
    }.toDF("word", "k", "chunk")
    val chunkCnt = wordChunks.join(wordCnt, "word")
      .groupBy($"chunk").agg(sum($"wcnt").as("ccnt")).persist()
    val seedCnt = chunkCnt.as[(String, Long)].mapPartitions { it =>
      it.flatMap { case (c, n) => UnigramLm.seedPieces(c).iterator.map(p => (p, n)) }
    }.toDF("piece", "ccnt").groupBy($"piece").agg(sum($"ccnt").as("cnt"))
    val vocab0 = seedCnt.filter(length($"piece") === 1 || $"cnt" >= UnigramLm.MinSeedCount).persist()
    val singles = vocab0.filter(length($"piece") === 1).count()
    val multi = vocab0.filter(length($"piece") > 1).count()
    val nChunks = chunkCnt.count()
    System.err.println(s"[p59b] chunks=$nChunks singles=$singles multi=$multi")
    spark.stop()
  }
}
