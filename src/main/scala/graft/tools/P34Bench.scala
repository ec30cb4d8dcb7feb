package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: p34 phase breakdown under bench-like conditions (warmed
  * JVM, cleared caches). */
object P34Bench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.codegen.cache.maxEntries", "1500")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.QualityClassifier
    // bench-style warmup
    graft.Tables.all.foreach { t => graft.Tables.load(spark, dir, t).limit(64).count() }
    spark.catalog.clearCache(); System.gc()
    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-14s ${(System.nanoTime() - t) / 1e9}%6.2fs"); t = System.nanoTime()
    }
    val feat = QualityClassifier.featureTable(graft.Tables.documents(spark, dir)).persist()
    feat.count(); lap("features")
    val lbl = QualityClassifier.labelTable(spark, dir).persist()
    lbl.count(); lap("labels")
    import spark.implicits._
    val train = feat.join(lbl.filter($"doc_id" % 4 =!= 0), Seq("doc_id"))
    val (w, bias, _) = QualityClassifier.fit(
      train.select($"doc_id", $"bucket", $"cnt"), lbl.filter($"doc_id" % 4 =!= 0))
    lap("fit")
    val root = graft.ml.ModelOracles.modelRoot(dir)
    feat.write.mode("overwrite").parquet(s"$root/p34_features"); lap("write feat")
    val wRows = w.toSeq.zipWithIndex.map { case (v, i) => (i, v) } :+ ((-1, bias))
    wRows.toDF("bucket", "w").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/p34_weights"); lap("write w")
    QualityClassifier.query(spark, dir).count(); lap("score(cached)")
    spark.stop()
  }
}
