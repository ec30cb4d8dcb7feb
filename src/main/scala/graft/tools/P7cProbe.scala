package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.PqAnn

/** Dev-only: stage timing for the p7c PQ ANN query. */
object P7cProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "1500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[t] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val e = graft.Tables.embeddings(spark, dir)
    time("load count")(println(e.count()))
    val cb = time("fitCodebooks cold")(
      PqAnn.fitCodebooks(e, "embedding", 4, 16))
    val cb2 = time("fitCodebooks warm")(
      PqAnn.fitCodebooks(e, "embedding", 4, 16))
    println(cb.length + " " + cb2.length)
    time("annTopK (incl refit)")(println(
      PqAnn.annTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10).count()))
    time("full p7c query warm")(println(
      PqAnn.query(spark, dir).count()))
    time("full p7c query warm2")(println(
      PqAnn.query(spark, dir).count()))
    spark.stop()
  }
}
