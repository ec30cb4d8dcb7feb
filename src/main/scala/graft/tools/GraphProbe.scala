package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: split q43/q44 cost into edge-derivation vs artifact-write
  * vs PageRank iterations vs BFS. Usage: GraphProbe <sfDir> */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.codegen.cache.maxEntries", "1500")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-18s ${(System.nanoTime() - t) / 1e9}%7.2fs"); t = System.nanoTime()
    }
    val derived = graft.operators.PageRank.deriveCsEdges(spark, dir)
    println("n_edges=" + derived.count()); lap("derive (count)")
    val e = graft.operators.PageRank.csEdges(spark, dir)
    e.count(); lap("artifact write+read")
    val r = graft.operators.PageRank.ranks(e)
    println("n_nodes=" + r.count()); lap("pagerank 3 iters")
    graft.operators.PageRank.query(spark, dir).count(); lap("q43 (artifact warm)")
    graft.SparkEntry.queries("q44_reachability")(spark, dir).count(); lap("q44")
    spark.stop()
  }
}
