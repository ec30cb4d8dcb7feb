package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: reproduce m5 inside a Verify-identical session. */
object M5Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      graft.ml.MlQueries.svmIpmEval(spark, args(0))
        .coalesce(1).write.mode("overwrite").parquet("/tmp/m5probe")
      println("M5 OK")
    } catch { case e: Throwable =>
      println("M5 FAILED: " + e.getMessage)
      e.printStackTrace()
    }
    spark.stop()
  }
}
