package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamOuterJoinSpec extends SparkSpec {

  test("s10: streaming left-outer join ≡ batch left join in the safe region; null rows actually emitted") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.s10StreamOuterJoin(spark, dir).collect().head

    // batch twin with the identical safe-region restriction
    val ev = graft.Tables.events(spark, dir)
    val r = ev.agg(max(when(col("event_type") === "click", col("ts"))).as("mc"),
                   max(when(col("event_type") === "purchase", col("ts"))).as("mp"))
      .head()
    val maxTs =
      if (r.getTimestamp(0).before(r.getTimestamp(1))) r.getTimestamp(0)
      else r.getTimestamp(1)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
        "left_outer")
      .filter(col("click_ts") <= lit(maxTs) - expr("INTERVAL 2 HOURS"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("purchase_ts")).as("n_matched"),
           sum(when(col("purchase_ts").isNull, 1L).otherwise(0L)).as("n_unmatched_clicks"),
           round(sum(col("value")), 2).as("sum_matched_value"))
      .collect().head

    assert(streamed.getLong(0) == batch.getLong(0))
    assert(streamed.getLong(1) == batch.getLong(1))
    assert(streamed.getLong(2) == batch.getLong(2))
    assert(streamed.get(3) == batch.get(3))
    // the outer semantic must actually fire — unmatched clicks exist
    assert(streamed.getLong(2) > 0L, "no null-side rows emitted; outer join untested")
  }
}
