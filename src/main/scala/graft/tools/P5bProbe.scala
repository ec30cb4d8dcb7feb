package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.EmbeddingDedup
import graft.functions.VectorOps

/** Dev probe: p5b phase costs + hyperplane bucket distribution.
  * Usage: tools/run.sh graft.tools.P5bProbe <sfDir> */
object P5bProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.codegen.cache.maxEntries", "1500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p5b] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val planes = {
      val m = classOf[EmbeddingDedup.type].getDeclaredMethod(
        "planesForSize", classOf[Long])
      m.setAccessible(true)
      m.invoke(EmbeddingDedup, java.lang.Long.valueOf(n)).asInstanceOf[Int]
    }
    println(s"[p5b] n=$n planes=$planes")
    val v = e.select(col("vec_id").as("id"),
      VectorOps.toDoubleArray(col("embedding")).as("vec"))
    val tables = graft.sim.LshAnn.hyperplanes(12, planes, 64)
    val banded = v.select(col("id"),
        posexplode(graft.sim.LshAnn.bucketKeys(col("vec"), tables)))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("band_key"))
    time("bucket histogram") {
      banded.groupBy("band_idx", "band_key").count().filter(col("count") >= 2)
        .selectExpr("count(*) as n_buckets",
          "sum(least(count,4096)*(least(count,4096)-1)/2) as capped_pairs",
          "sum(count*(count-1)/2) as raw_pairs",
          "max(count) as max_bucket", "percentile(count, 0.999) as p999")
        .show(false)
    }
    val lsh = time("lsh pairs (materialized)") {
      val p = EmbeddingDedup.nearDupPairsLsh(e, "vec_id", "embedding", 0.4,
        planesPerTable = planes, eager = true)
      println(s"[p5b] n_pairs=${p.count()}")
      p
    }
    time("full queryLsh") {
      println(s"[p5b] rows=${EmbeddingDedup.queryLsh(spark, dir).count()}")
    }
    spark.stop()
  }
}
