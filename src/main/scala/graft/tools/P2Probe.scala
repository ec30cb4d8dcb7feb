package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: standalone query timings. */
object P2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("p5", "p6")) {
      val t0 = System.nanoTime()
      val n = q match {
        case "p5" => graft.dedup.EmbeddingDedup.query(spark, args(0)).count()
        case "p6" => graft.sim.Knn.query(spark, args(0)).count()
      }
      System.err.println(f"[t] $q end-to-end ${(System.nanoTime() - t0) / 1e9}%.1fs, $n rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
