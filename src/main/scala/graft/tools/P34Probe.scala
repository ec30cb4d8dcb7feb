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
    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-12s ${(System.nanoTime() - t) / 1e9}%6.2fs"); t = System.nanoTime()
    }
    val feat = QualityClassifier.featureTable(graft.Tables.documents(spark, dir)).persist()
    feat.count(); lap("features")
    val lbl = QualityClassifier.labelTable(spark, dir).persist()
    lbl.count(); lap("labels")
    for (it <- Seq(1, 1, 5)) {
      val t0 = System.nanoTime()
      val (_, _, losses) = QualityClassifier.fit(feat, lbl, iters = it)
      println(f"iters=$it%3d  total=${(System.nanoTime() - t0) / 1e9}%6.2fs")
      println("losses: " + losses.map(l => f"$l%.6f").mkString(", "))
    }
    t = System.nanoTime()
    graft.text.QualityClassifier.ensureFitted(spark, dir); lap("ensureFit")
    graft.text.QualityClassifier.query(spark, dir).count(); lap("score")
    spark.stop()
  }
}
