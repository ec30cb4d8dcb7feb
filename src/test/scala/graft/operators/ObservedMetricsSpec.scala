package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObservedMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("observed telemetry equals the ground-truth aggregates") {
    val m = ObservedMetrics.u15ObservedMetricsQuery(spark, sf).collect().head
    val toks = split($"text", "\\s+")
    val ref = graft.Tables.documents(spark, sf)
      .select($"lang", $"source", size(toks).as("n_words"),
        floor(lit(1e6) * size(array_distinct(toks)) / size(toks))
          .cast("long").as("uniq_micro"))
      .agg(count(lit(1)), sum(when($"lang" === "en" && $"n_words" >= 5 &&
             $"uniq_micro" >= 200000L, 1L).otherwise(0L)),
           sum($"uniq_micro"), sum(when($"lang" === "en", 1L).otherwise(0L)))
      .collect().head
    assert(m.getLong(0) === ref.getLong(0))
    assert(m.getLong(1) === ref.getLong(1))
    assert(m.getLong(2) === ref.getLong(2))
    assert(m.getLong(3) === ref.getLong(3))
    assert(m.getLong(1) > 0 && m.getLong(1) < m.getLong(0),
      "both gate branches must be exercised")
  }

  test("metrics ride the existing plan as a CollectMetrics node") {
    val docs = graft.Tables.documents(spark, sf)
    val obs = new org.apache.spark.sql.Observation("plan_probe")
    val df = docs.observe(obs, count(lit(1)).as("n"))
    assert(df.queryExecution.analyzed.toString.contains("CollectMetrics"),
      "observe() must attach in-plan metrics, not a second scan")
    df.count()
    assert(obs.get("n").asInstanceOf[Long] === docs.count())
  }
}
