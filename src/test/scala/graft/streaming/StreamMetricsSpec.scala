package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("s15: dropped-by-watermark telemetry equals the planted late cohort, emitted windows match batch") {
    val out = StreamMetrics.s15StreamMetrics(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // the in-query require already pinned counter == planted; re-derive
    // the planted count here independently and check the emitted column
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    val planted = ev
      .filter($"ts" < lit(maxTs) - expr("INTERVAL 3 HOURS"))
      .filter(pmod(conv(substring(md5(concat(lit("s15:"), $"event_id".cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(97)) === 0)
      .select(window($"ts", "1 hour"), $"event_type").distinct()
      .count()
    assert(planted > 0, "fixture must actually plant late rows")
    out.foreach(r => assert(r.getAs[Long]("dropped_late") == planted))
    // emitted-window totals equal the batch replay of the same cut
    val wm = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000L)
    val batch = ev
      .filter(window($"ts", "1 hour")("end") <= lit(wm))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_events") == batch(r.getAs[String]("event_type")),
        s"emitted totals drifted for ${r.getAs[String]("event_type")}")
    }
  }
}
