package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B PageRank inner-loop variants to locate the q43 cost.
  * Run via `sbt "runMain graft.tools.PrProbe <dataDir>"` — the data dir
  * is a REQUIRED argument (no environment-specific default), and the
  * probe refuses to run inside a process that already has a live
  * SparkSession (getOrCreate with .master() would silently grab and
  * reconfigure it). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse {
      System.err.println("usage: graft.tools.PrProbe <dataDir>")
      sys.exit(2)
    }
    if (SparkSession.getActiveSession.nonEmpty || SparkSession.getDefaultSession.nonEmpty) {
      System.err.println("PrProbe: refusing to run — a SparkSession already exists in this JVM")
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.codegen.cache.maxEntries", "1500")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.operators.PageRank.csEdges(spark, dir)
    edges.count() // artifact warm

    def timeIt(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (n=$n)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // A: committed shape (repartition+persist edges, eager deg checkpoint)
    timeIt("A committed") {
      graft.operators.PageRank.ranks(edges).count()
    }

    // B: per-iteration eager checkpoint of pr (truncate lineage)
    timeIt("B iter-checkpoint") {
      val e = edges.repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
        .persist()
      val n = deg.count()
      var pr = deg.select(col("node"), (lit(1.0) / lit(n)).as("pr"))
      for (_ <- 1 to 3) {
        val msg = pr.join(deg, Seq("node"))
          .select(col("node").as("src"),
            floor((col("pr") / col("outdeg")) * lit(1e12)).cast("long").as("c"))
        pr = e.join(msg, Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum("c").as("s"))
          .select(col("node"),
            (lit(0.15) / lit(n) + lit(0.85) * (col("s").cast("double") / lit(1e12))).as("pr"))
          .localCheckpoint(true)
      }
      val out = pr.count()
      e.unpersist(false); deg.unpersist(false)
      out
    }

    // C: no edge persist at all — plain parquet re-scan each iteration,
    //    broadcast the vertex-sized message table
    timeIt("C rescan+broadcast") {
      val e = edges
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
        .persist()
      val n = deg.count()
      var pr = deg.select(col("node"), (lit(1.0) / lit(n)).as("pr"))
      for (_ <- 1 to 3) {
        val msg = pr.join(deg, Seq("node"))
          .select(col("node").as("src"),
            floor((col("pr") / col("outdeg")) * lit(1e12)).cast("long").as("c"))
        pr = e.join(broadcast(msg), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum("c").as("s"))
          .select(col("node"),
            (lit(0.15) / lit(n) + lit(0.85) * (col("s").cast("double") / lit(1e12))).as("pr"))
          .localCheckpoint(true)
      }
      val out = pr.count()
      deg.unpersist(false)
      out
    }

    // D: like C but lazy lineage (no checkpoint) — measures nesting cost
    timeIt("D rescan+broadcast lazy") {
      val e = edges
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
        .persist()
      val n = deg.count()
      var pr = deg.select(col("node"), (lit(1.0) / lit(n)).as("pr"))
      for (_ <- 1 to 3) {
        val msg = pr.join(deg, Seq("node"))
          .select(col("node").as("src"),
            floor((col("pr") / col("outdeg")) * lit(1e12)).cast("long").as("c"))
        pr = e.join(broadcast(msg), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum("c").as("s"))
          .select(col("node"),
            (lit(0.15) / lit(n) + lit(0.85) * (col("s").cast("double") / lit(1e12))).as("pr"))
      }
      val out = pr.count()
      deg.unpersist(false)
      out
    }

    // A again (JIT-warm rerun of the committed shape)
    timeIt("A committed (warm)") {
      graft.operators.PageRank.ranks(edges).count()
    }
    spark.stop()
  }
}
