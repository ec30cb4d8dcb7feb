package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev aid: Verify for a comma-separated subset of query names —
  * iterate on one query + its oracle without paying the full pack.
  * Usage: VerifySubset <sfDir> <outDir> <name1,name2,…>
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // see Bench.scala: finer initial grain for fat-row shuffles
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true") // match Bench/Verify
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "1500") // see Verify.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.filter(q => wanted(q._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        System.err.println(f"[subset] $name ok ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch { case e: Throwable =>
        System.err.println(s"[subset] $name FAILED: ${e.getMessage}")
        e.printStackTrace()
      }
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // keep the model-replay oracle paths anchored to THIS run's data dir
    // (see Verify.scala)
    val modelRootFix: String => String =
      _.replace("/tmp/graft_models/sf0.01", graft.ml.ModelOracles.modelRoot(sfDir))
    val json = graft.SparkEntry.oracleSql.filter(o => wanted(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(modelRootFix(v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
