package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run one named SparkEntry query and show the result. */
object P2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(args(1))(spark, args(0)).show(10, false)
    System.err.println(f"[t] ${args(1)} ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
