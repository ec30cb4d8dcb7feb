package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("q21c: below k distinct values the sketch IS exact") {
    val df = (1 to 100).map(i => i % 40).toDF("v") // 40 distinct
    val r = KmvSketch.sketch(df, "v", k = 256).head()
    assert(r.getAs[Long]("k_used") == 40)
    assert(r.getAs[Long]("est_micro") == 40L * 1000000L)
    assert(r.getAs[Long]("exact_parts") == 40)
    assert(r.getAs[Long]("rel_err_micro") == 0)
  }

  test("q21c: at scale the estimate lands within the analytic error band and is partitioning-invariant") {
    val df = spark.range(20000).toDF("v")
    val r = KmvSketch.sketch(df, "v", k = 256).head()
    val est = r.getAs[Long]("est_micro").toDouble / 1e6
    val exact = r.getAs[Long]("exact_parts").toDouble
    assert(math.abs(est - exact) / exact <= 4.0 / math.sqrt(254.0),
      s"est $est vs exact $exact")
    // determinism under repartitioning — the property HLL++ lacks and
    // the reason this sketch can carry a hash gate
    val r2 = KmvSketch.sketch(df.repartition(13), "v", k = 256).head()
    assert(r2.getAs[Long]("est_micro") == r.getAs[Long]("est_micro"))
    assert(r2.getAs[Long]("kth_hash") == r.getAs[Long]("kth_hash"))
  }

  test("q21c: production path (audit=false) matches the audited sketch, shuffle-free plan") {
    val df = spark.range(20000).toDF("v")
    val audited = KmvSketch.sketch(df, "v", k = 256).head()
    val prod = KmvSketch.sketch(df.repartition(9), "v", k = 256, audit = false).head()
    assert(prod.schema.fieldNames.toSeq == Seq("k_used", "kth_hash", "est_micro"),
      "production sketch must not carry the audit columns")
    assert(prod.getAs[Long]("est_micro") == audited.getAs[Long]("est_micro"))
    assert(prod.getAs[Long]("kth_hash") == audited.getAs[Long]("kth_hash"))
  }

  test("q21c: bounded k-min fold + merge ≡ global distinct bottom-k") {
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(5000)(rnd.nextInt(900).toLong) // heavy duplication
    val expected = vals.distinct.sorted.take(64)
    // arbitrary partition split points, merged in tree order
    val parts = vals.grouped(613).toArray
      .map(p => KmvSketch.kminPartition(p.iterator, 64))
    val merged = parts.reduce((a, b) => KmvSketch.mergeKmin(a, b, 64))
    assert(merged.toSeq == expected.toSeq,
      "per-partition capped TreeSet + two-pointer merge must equal the global k smallest distinct")
  }

  test("q21c query: lineitem part keys, estimate within the fail-fast bound") {
    // sf0.001 has only 200 distinct part keys — below k, the sketch is
    // the exact set; sf0.01 exercises the estimator (k_used = 256)
    val r = KmvSketch.query(spark, "/root/testdata/sf0.001").head()
    assert(r.getAs[Long]("k_used") == 200 && r.getAs[Long]("rel_err_micro") == 0)
    val r2 = KmvSketch.query(spark, "/root/testdata/sf0.01").head()
    assert(r2.getAs[Long]("k_used") == 256)
    assert(r2.getAs[Long]("rel_err_micro") <= (4e6 / math.sqrt(254.0)).toLong)
  }
}
