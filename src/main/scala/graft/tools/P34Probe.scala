package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: marginal per-iteration cost of the p34 GD loop. */
object P34Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.QualityClassifier
    val feat = QualityClassifier.featureTable(graft.Tables.documents(spark, dir))
    val lbl = QualityClassifier.labelTable(spark, dir)
    for (it <- Seq(1, 5, 5, 20)) {
      val t0 = System.nanoTime()
      QualityClassifier.fit(feat, lbl, iters = it)
      println(f"iters=$it%3d  total=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
