package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("funnel stages are monotonically non-increasing") {
    val r = Analytics.q32Funnel(spark, dir).head()
    val (s, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s >= c && c >= p, s"funnel must narrow: $s -> $c -> $p")
    assert(s > 0, "some user signs up")
  }

  test("retention cohorts cover every user exactly once at offset 0") {
    val df = Analytics.q33Retention(spark, dir).cache()
    val users = graft.Tables.events(spark, dir).select($"user_id").distinct().count()
    val atZero = df.filter($"week_offset" === 0L)
      .agg(sum($"n_active")).head().getLong(0)
    // every user is active in their own cohort week
    assert(atZero == users, s"offset-0 actives $atZero != $users users")
    assert(df.filter($"week_offset" < 0L).count() == 0)
    df.unpersist()
  }

  test("sliding windows cover each event exactly 4 times") {
    val total = graft.Tables.events(spark, dir).count()
    val windowed = Analytics.q34SlidingWindows(spark, dir)
      .agg(sum($"n_events")).head().getLong(0)
    assert(windowed == 4 * total, s"1h/15min slide => 4 windows per event ($windowed vs $total)")
  }

  test("histogram partitions all orders") {
    val df = Analytics.q35Histogram(spark, dir).cache()
    val n = df.agg(sum($"n_orders")).head().getLong(0)
    assert(n == graft.Tables.orders(spark, dir).count())
    assert(df.filter($"bin" < 0L || $"bin" > 19L).count() == 0)
    df.unpersist()
  }

  test("corr stats are bounded and consistent") {
    val rows = Analytics.q36CorrStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sd, v, corr) = (r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(math.abs(sd * sd - v) < 1e-3, "stddev^2 ~ variance")
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }
}
