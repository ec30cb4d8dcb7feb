package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-round cost of the p59 Viterbi-EM loop as the round
  * count grows — the parameter-scale question the BPE merge chain
  * failed (r10 verdict #1): does anything accumulate per EM round?
  * Expected: flat per-round cost (each round collects a vocab-sized
  * cost map and rebuilds the typed pass from scratch — no lineage, no
  * plan growth), so 32 rounds cost ~16× 2 rounds, not quadratic, and
  * the plan of the final segmentation pass is identical at any round
  * count. */
object P59Probe {
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
    val wordCnt = docWords.groupBy($"word").agg(count(lit(1)).as("wcnt")).persist()
    val chunkCnt = wordCnt.select($"word").as[String].mapPartitions { it =>
      it.flatMap(w => UnigramLm.chunksOf(w).iterator)
    }.toDF("chunk").groupBy($"chunk").agg(count(lit(1)).as("ccnt")).persist()
    chunkCnt.count()

    // seed costs via the same construction the query uses
    val seedCnt = chunkCnt.as[(String, Long)].mapPartitions { it =>
      it.flatMap { case (c, n) => UnigramLm.seedPieces(c).iterator.map(p => (p, n)) }
    }.toDF("piece", "ccnt").groupBy($"piece").agg(sum($"ccnt").as("cnt"))
    val vocab0 = seedCnt.filter(length($"piece") === 1 || $"cnt" >= UnigramLm.MinSeedCount).persist()
    val singles = vocab0.filter(length($"piece") === 1).select($"piece").persist()
    singles.count()
    val tot = vocab0.agg(sum($"cnt")).head().getLong(0).toDouble
    var costMap = vocab0.select($"piece",
        (-floor(lit(1e6) * log($"cnt".cast("double") / lit(tot)))).cast("long").as("pc"))
      .as[(String, Long)].collect().toMap

    def emRound(cost: Map[String, Long]): Map[String, Long] = {
      val bc = spark.sparkContext.broadcast(cost)
      val usage = chunkCnt.as[(String, Long)].mapPartitions { it =>
        val c = bc.value
        it.flatMap { case (ch, n) => UnigramLm.viterbi(ch, c).iterator.map(p => (p, n)) }
      }.toDF("piece", "ccnt").groupBy($"piece").agg(sum($"ccnt").as("usage"))
      val kept = usage.join(singles, Seq("piece"), "full")
        .select($"piece", (coalesce($"usage", lit(0L)) + 1L).as("u"))
      val t = kept.agg(sum($"u")).head().getLong(0).toDouble
      kept.select($"piece",
          (-floor(lit(1e6) * log($"u".cast("double") / lit(t)))).cast("long").as("pc"))
        .as[(String, Long)].collect().toMap
    }

    var round = 0
    val marks = Set(2, 8, 32)
    val t0 = System.nanoTime()
    while (round < 32) {
      costMap = emRound(costMap)
      round += 1
      if (marks(round))
        System.err.println(f"[p59] rounds=$round%-3d cumulative ${(System.nanoTime() - t0) / 1e9}%7.2fs (vocab ${costMap.size})")
    }
    spark.stop()
  }
}
