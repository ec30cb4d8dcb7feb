package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-level dup fraction of the p33c ladder — how much the
  * singleton-pruning lemma can actually remove per round on a given
  * corpus (drives the pruneBelow threshold choice). */
object P33cDupFrac {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val chars = graft.Tables.documents(spark, dir)
      .select($"doc_id", posexplode(filter(split($"text", ""), x => x =!= lit(""))))
      .withColumnRenamed("col", "ch").persist()
    val n = chars.count()
    val t0 = System.nanoTime()
    val levels = graft.dedup.SaRepeats.repLadder(chars, graft.dedup.SaRepeats.MaxLevel)
    levels.foreach { case (k, rep) =>
      val dup = rep.agg(coalesce(sum(col(s"rep_$k")), lit(0L))).head().getLong(0)
      System.err.println(f"[p33c] level $k%3d dup=$dup%12d frac=${dup.toDouble / n}%.4f")
    }
    System.err.println(f"[p33c] total ${(System.nanoTime() - t0) / 1e9}%.1fs n=$n")
    spark.stop()
  }
}
