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

  test("q29c: duplicate (l_orderkey, l_linenumber) pairs with different prices stay deterministic") {
    // The r13 flake: the driver testdata has 11,785 duplicated
    // (l_orderkey, l_linenumber) pairs at sf0.01, and two rows sharing
    // (5325, 6) with different prices straddled the k=512 boundary —
    // with the hash keyed on the pair alone, which twin entered the
    // sample was scan-order luck. Plant that exact shape: a fixture
    // where EVERY key pair is duplicated with a distinct price and the
    // group is larger than K, so ~half the sample's cut lines fall
    // between twins. The content-addressed order (price-cents in hash
    // and tie-break) must produce the identical sample multiset under
    // 1-partition, 7-partition, and reshuffled layouts.
    val n = SampleQuantiles.K * 3
    val rows = (1 to n).flatMap { i =>
      // twin rows: same (ok, ln), prices differ by a deterministic step
      Seq((i.toLong % 97, i % 7, 100.0 + i * 0.01, "N"),
          (i.toLong % 97, i % 7, 200.0 + i * 0.01, "N"))
    }
    def asLineitem(parts: Int, shuffled: Boolean) = {
      val base = if (shuffled) scala.util.Random.shuffle(rows) else rows
      spark.createDataFrame(base).toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
        .repartition(parts)
    }
    val one  = SampleQuantiles.sampleOf(asLineitem(1, shuffled = false)).collect()
    val many = SampleQuantiles.sampleOf(asLineitem(7, shuffled = false)).collect()
    val shuf = SampleQuantiles.sampleOf(asLineitem(7, shuffled = true)).collect()
    assert(one.sameElements(many), "partition layout changed the sample — order not total")
    assert(one.sameElements(shuf), "scan order changed the sample — order not total")
    assert(one.head.getAs[Long]("n_sample") == SampleQuantiles.K)
  }

  test("q29c: below-k groups sample everything — the estimate is the exact percentile") {
    // sf0.001 groups exceed k, so check the exactness property on the
    // operator's building blocks: a group smaller than K yields the
    // exact interpolated quantile of ALL its values
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter($"l_orderkey" < 60) // small slice; per-flag groups < K
    val nMax = li.groupBy($"l_returnflag").count().agg(max($"count")).head().getLong(0)
    assert(nMax < SampleQuantiles.K, s"slice too big for the exactness check: $nMax")
    val sampled = SampleQuantiles.sampleOf(li)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = graft.queries.Relational.exactPercentilesOf(
      li, "l_returnflag", "l_extendedprice", Seq(0.5 -> "p50", 0.95 -> "p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val counts = li.groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, (p50, p95)) =>
      val (nS, s50, s95) = sampled(flag)
      assert(nS == counts(flag), "below k the sample is the whole group")
      assert(math.abs(s50 - p50) < 0.02, s"$flag p50: $s50 vs exact $p50")
      assert(math.abs(s95 - p95) < 0.02, s"$flag p95: $s95 vs exact $p95")
    }
  }
}
