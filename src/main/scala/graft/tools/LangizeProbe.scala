package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: fit P54 on the langized sf0.01 corpus and report
  * train/held-out accuracy and margin spread. */
object LangizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.text.LangClassifier._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val lz = langized(docs)
    val feat = featureTable(lz).persist()
    val trainLbl = lz.filter(isTrain($"doc_id")).select($"doc_id", $"lang").persist()
    val train = feat.join(trainLbl.select($"doc_id"), Seq("doc_id"), "left_semi")
    val iters = sys.env.getOrElse("ITERS","3").toInt
    val ridge = sys.env.getOrElse("RIDGE","0.001").toDouble
    val fitted = fitOvr(train, trainLbl, iters, ridge)
    fitted.foreach { case (l, w, b) =>
      println(f"$l: bias=$b%.4f |w|max=${w.map(math.abs).max}%.4f |w|mean=${w.map(math.abs).sum/w.length}%.4f") }
    val weights = fitted.flatMap { case (l,w,b) =>
      w.toSeq.zipWithIndex.map{case(v,i)=>(l,i,v)} :+ ((l,-1,b)) }.toDF("lang","bucket","w")
    val pred = predict(marginTable(feat, weights))
      .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
      .withColumn("is_train", isTrain($"doc_id"))
    pred.groupBy($"is_train").agg(
      count(lit(1)).as("n"),
      avg(when($"lang_pred" === $"lang", 1.0).otherwise(0.0)).as("acc")).show()
    pred.groupBy($"lang", $"lang_pred").count().orderBy($"lang", $"lang_pred").show(40)
    spark.stop()
  }
}
