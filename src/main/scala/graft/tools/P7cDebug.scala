package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.{Knn, PqAnn}

/** Dev-only: per-query PQ recall at several (m, k, rerank) settings. */
object P7cDebug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, dir)
    val qdf = e.filter($"vec_id" < 5)
    val exact = Knn.bruteForce(e, qdf, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").persist()
    exact.count()
    for ((m, k, rr) <- Seq((4, 16, 50), (8, 16, 50), (8, 16, 100), (16, 16, 50), (8, 32, 50))) {
      val t0 = System.nanoTime()
      val ann = PqAnn.annTopK(e, qdf, "vec_id", "embedding", 10, m = m, kCode = k, rerank = rr)
        .select($"query_id", $"neighbor_id")
      val ov = ann.join(exact, Seq("query_id", "neighbor_id"), "leftsemi")
        .groupBy($"query_id").agg(count(lit(1)).as("o"))
      val rows = ov.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val per = (0 until 5).map(i => rows.getOrElse(i.toLong, 0L) / 10.0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"m=$m k=$k rerank=$rr  per-query recall=${per.mkString(",")}  min=${per.min}  mean=${per.sum / 5}%.2f  ${dt}%.1fs")
    }
    spark.stop()
  }
}
