package graft.text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LangPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum","256")
      .config("spark.sql.codegen.cache.maxEntries","1500")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(b: => A): A = {
      val t0=System.nanoTime(); val r=b
      println(f"$tag%-22s ${(System.nanoTime()-t0)/1e9}%6.2fs"); r }
    val docs = graft.Tables.documents(spark, dir)
    val feat = t("featureTable+persist"){ val f=LangClassifier.featureTable(docs).persist(); f.count(); f }
    val trainLbl = t("trainLbl"){ val l=docs.filter(LangClassifier.isTrain($"doc_id")).select($"doc_id",$"lang").persist(); l.count(); l }
    val train = feat.join(trainLbl.select($"doc_id"), Seq("doc_id"), "left_semi")
    val fitted = t("fitOvr"){ LangClassifier.fitOvr(train, trainLbl) }
    val weights = fitted.flatMap { case (l,w,b) => w.toSeq.zipWithIndex.map{case(v,i)=>(l,i,v)} :+ ((l,-1,b)) }.toDF("lang","bucket","w")
    t("write features"){ feat.write.mode("overwrite").parquet("/tmp/p54probe_feat") }
    t("score+argmax"){ LangClassifier.predict(LangClassifier.marginTable(spark.read.parquet("/tmp/p54probe_feat"), weights)).count() }
    spark.stop()
  }
}
