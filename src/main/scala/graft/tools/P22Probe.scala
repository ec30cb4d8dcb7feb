package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timing for the p22/p23 cleaning queries. */
object P22Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[t] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    val w = docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
    time("w count")(println(w.count()))
    val bg = w.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(w) - 1), i -> array_join(slice(w, i, 2), ' '))")).as("bg"))
    time("bigram explode count")(println(bg.count()))
    val top = bg.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"))
    time("top agg count")(println(top.count()))
    time("full p22")(println(
      graft.pipeline.CleaningOps.repetitionQuery(spark, dir).count()))
    time("full p22 again")(println(
      graft.pipeline.CleaningOps.repetitionQuery(spark, dir).count()))
    time("full p23")(println(
      graft.pipeline.CleaningOps.boilerplateQuery(spark, dir).count()))
    spark.stop()
  }
}
