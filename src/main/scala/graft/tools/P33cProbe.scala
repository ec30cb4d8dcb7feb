package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the p33c prefix-doubling ladder. */
object P33cProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[p33c] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    val chars = graft.Tables.documents(spark, dir)
      .select($"doc_id", posexplode(filter(split($"text", ""), x => x =!= lit(""))))
      .withColumnRenamed("col", "ch").persist()
    time("chars build")(chars.count())
    val tmp = java.nio.file.Files.createTempDirectory("p33c_probe").toString
    // level 1 by hand, timing each piece
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"pid").orderBy($"r1", $"r2")
    val charRanks = chars.select($"ch".as("r1"), lit(0L).as("r2")).distinct()
      .repartitionByRange($"r1", $"r2")
      .withColumn("pid", spark_partition_id())
      .withColumn("r", $"pid".cast("long") * lit(1L << 40) + row_number().over(w))
      .select($"r1".as("ch"), $"r")
    val lvl1 = chars.join(charRanks, "ch").select($"doc_id", $"pos", $"r")
    time("lvl1 store") {
      lvl1.write.mode("overwrite").parquet(s"$tmp/l1")
    }
    var cur = spark.read.parquet(s"$tmp/l1")
    var k = 1
    while (k <= 8) {
      val a = cur.select($"doc_id", $"pos", $"r".as("r1"))
      val b = cur.select($"doc_id", ($"pos" - k).as("pos"), $"r".as("r2"))
      val pairs = a.join(b, Seq("doc_id", "pos"))
      val n = time(s"k=$k pairs count")(pairs.count())
      val distinctK = time(s"k=$k distinct") {
        val d = pairs.select($"r1", $"r2").distinct().persist()
        val c = d.count(); (d, c)
      }
      val ranks = distinctK._1
        .repartitionByRange($"r1", $"r2")
        .withColumn("pid", spark_partition_id())
        .withColumn("r", $"pid".cast("long") * lit(1L << 40) + row_number().over(w))
        .select($"r1", $"r2", $"r")
      time(s"k=$k rank+join+store") {
        pairs.join(ranks, Seq("r1", "r2")).select($"doc_id", $"pos", $"r")
          .write.mode("overwrite").parquet(s"$tmp/l${2 * k}")
      }
      distinctK._1.unpersist(false)
      val nxt = spark.read.parquet(s"$tmp/l${2 * k}")
      val dups = time(s"k=$k dupOnly store") {
        val dupRanks = nxt.groupBy($"r").agg(count(lit(1)).as("nr"))
          .filter($"nr" >= 2).select($"r")
        nxt.join(dupRanks, "r").select($"doc_id", $"pos", $"r")
          .write.mode("overwrite").parquet(s"$tmp/d${2 * k}")
        spark.read.parquet(s"$tmp/d${2 * k}").count()
      }
      System.err.println(s"[p33c] k=$k pairs=$n distinct=${distinctK._2} dupNext=$dups")
      cur = spark.read.parquet(s"$tmp/d${2 * k}")
      k *= 2
    }
    graft.operators.ScaleOps.deleteRecursively(tmp)
    spark.stop()
  }
}
