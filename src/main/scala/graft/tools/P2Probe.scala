package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: repeated p2/p4 timings to check run-to-run stability. */
object P2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (round <- 1 to 2; q <- Seq("p2", "p4")) {
      val t0 = System.nanoTime()
      val n = q match {
        case "p2" => graft.dedup.MinHashDedup.query(spark, args(0)).count()
        case "p4" => graft.dedup.NgramJaccard.query(spark, args(0)).count()
      }
      System.err.println(f"[t] round$round $q ${(System.nanoTime() - t0) / 1e9}%.1fs, $n pairs")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
