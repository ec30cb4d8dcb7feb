package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("aggregator equals the window formulation under any partitioning") {
    val expected = WeightedSample.windowTwin(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(expected.nonEmpty, "window twin must produce sample rows")
    // the bounded-buffer reduce/merge must be partitioning-invariant:
    // same rows, same ranks, whether one task folds everything or the
    // input is scattered across many partial buffers
    for (parts <- Seq(1, 7, 32)) {
      val docs = graft.Tables.documents(spark, dir).repartition(parts)
      val sampler = udaf(new WeightedReservoir(5),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long, Long)]())
      val got = docs
        .select(col("source"), col("doc_id"),
                (length(col("text")) + 1).cast("long").as("weight"))
        .withColumn("key", WeightedSample.aesKey(col("doc_id"), col("weight").cast("double")))
        .groupBy(col("source"))
        .agg(sampler(col("key"), col("doc_id"), col("weight")).as("picks"))
        .select(col("source"), posexplode(col("picks")))
        .select(col("source"), (col("pos") + 1).cast("long"),
                col("col._2"), col("col._3"))
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got.sorted == expected.sorted, s"mismatch at $parts partitions")
    }
  }

  test("heavier rows are sampled proportionally more often") {
    // plant two weight classes; across the 20 source groups the heavy
    // rows must dominate the picks (A-ES inclusion scales with weight)
    val res = WeightedSample.query(spark, dir)
      .join(graft.Tables.documents(spark, dir).select(col("doc_id"), length(col("text")).as("len")),
            Seq("doc_id"))
      .agg(avg(col("len"))).as[Double].head()
    val overall = graft.Tables.documents(spark, dir)
      .agg(avg(length(col("text")))).as[Double].head()
    assert(res > overall,
      f"weighted sample mean length $res%.1f must exceed corpus mean $overall%.1f")
  }

  test("aggregate plan is a hash aggregate, not a window sort") {
    val plan = WeightedSample.query(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "custom Aggregator must run as an object hash aggregate with partial merge")
    assert(!plan.contains("Window"), "the sample itself must not use a window")
  }
}
