package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.{DedupClusters, MinHashDedup}

/** Dev probe: split p14's cost into pair-pipeline vs connected-components
  * phases. Usage: tools/run.sh graft.tools.P14Probe <sfDir> */
object P14Probe {
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
      println(f"[p14probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = Tables.documents(spark, dir)
    val pairs = time("pairs (materialized)") {
      val p = MinHashDedup.nearDuplicatePairs(docs, "doc_id", "text", 0.8)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .localCheckpoint(true)
      println(s"[p14probe] n_pairs=${p.count()}")
      p
    }
    val cc = time("connectedComponents") {
      val c = DedupClusters.connectedComponents(pairs)
      println(s"[p14probe] n_labeled=${c.count()}")
      c
    }
    time("orderBy+count") {
      cc.select(col("id").as("doc_id"), col("comp").as("cluster_id"))
        .orderBy("doc_id").count()
    }
    // second CC run on the same edges: JVM-warm cost of the loop itself
    time("connectedComponents (warm)") {
      println(s"[p14probe] n2=${DedupClusters.connectedComponents(pairs).count()}")
    }
    spark.stop()
  }
}
