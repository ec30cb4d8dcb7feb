package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: build a larger scale factor by key-shifted replication of
  * an existing driver-generated SF dir (the driver's generator is not
  * available in this container, and /root/testdata is read-only).
  *
  * Every replica shifts the table's primary/foreign keys by i·OFF so
  * referential integrity holds across the whole scaled corpus; content
  * columns are kept byte-identical, which deliberately grows the dedup
  * pair graph and ANN twin structure with SF — a harsher scaling test
  * for p2/p14 than fresh random text would be. region/nation stay
  * unscaled (TPC-H dimension semantics).
  *
  * Usage: MakeScaledData <srcDir> <dstDir> <factor>
  */
object MakeScaledData {
  private val OFF = 1000000000L // far above any sf0.1 key

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, shifted: Seq[String]): DataFrame =
      (0 until factor).map { i =>
        shifted.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * OFF)))
      }.reduce(_ union _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[scale] $name done")
    }

    write(spark.read.parquet(s"$src/region.parquet"), "region")
    write(spark.read.parquet(s"$src/nation.parquet"), "nation")
    write(replicate(spark.read.parquet(s"$src/customer.parquet"), Seq("c_custkey")), "customer")
    write(replicate(spark.read.parquet(s"$src/supplier.parquet"), Seq("s_suppkey")), "supplier")
    write(replicate(spark.read.parquet(s"$src/part.parquet"), Seq("p_partkey")), "part")
    write(replicate(spark.read.parquet(s"$src/orders.parquet"),
      Seq("o_orderkey", "o_custkey")), "orders")
    write(replicate(spark.read.parquet(s"$src/lineitem.parquet"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    // events: keep ts as raw int64 nanos on disk — Tables.events applies
    // the same nanos→micros conversion whether the column is annotated
    // TIMESTAMP(NANOS) or a plain long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write(replicate(spark.read.parquet(s"$src/events.parquet"),
      Seq("event_id", "user_id")), "events")
    write(replicate(spark.read.parquet(s"$src/documents.parquet"), Seq("doc_id")), "documents")
    write(replicate(spark.read.parquet(s"$src/embeddings.parquet"), Seq("vec_id")), "embeddings")
    spark.stop()
  }
}
