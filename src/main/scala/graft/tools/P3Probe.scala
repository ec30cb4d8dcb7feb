package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.SimHashDedup

/** Dev probe: simhash band-bucket size distribution on a corpus — the
  * input that decides whether p3's uncapped in-bucket pair expansion is
  * safe. Usage: tools/run.sh graft.tools.P3Probe <sfDir> */
object P3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val sigs = docs.select(col("doc_id").as("id"),
      SimHashDedup.signature(split(col("text"), "\\s+")).as("sig")).cache()
    // composite (band, sub-band) 28-bit keys: band b's 16 bits + 12-bit
    // chunk s of the 48 bits outside band b
    val combos = for (b <- 0 until 4; s <- 0 until 4) yield {
      val others = (0 until 4).filter(_ != b)
      val other48 = others.zipWithIndex.map { case (j, r) =>
        shiftleft(SimHashDedup.bandKey(col("sig"), j), 16 * r) }
        .reduce(_.bitwiseOR(_))
      val subKey = shiftrightunsigned(other48, 12 * s).bitwiseAND(lit(0xFFFL))
      struct(lit(b * 4 + s).as("k"),
        shiftleft(SimHashDedup.bandKey(col("sig"), b), 12).bitwiseOR(subKey).as("key"))
    }
    val banded = sigs.select(col("id"), explode(array(combos: _*)).as("c"))
      .select(col("id"), col("c.k").as("band_idx"), col("c.key").as("band_key"))
    banded.groupBy("band_idx", "band_key").count().filter(col("count") >= 2)
      .selectExpr("count(*) as n_buckets", "sum(count*(count-1)/2) as total_pairs",
        "max(count) as max_bucket", "percentile(count, 0.999) as p999")
      .show(false)
    spark.stop()
  }
}
