package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlDedupSpec extends SparkSpec {

  test("canonicalizeUrl: every rule, hand-checked") {
    import spark.implicits._
    val cases = Seq(
      ("HTTP://WWW.Ex.COM:80/A/b/?id=3&utm_source=x#frag", "http://ex.com/A/b?id=3"),
      ("http://ex.com/A/b?utm_source=x&utm_campaign=y",     "http://ex.com/A/b"),
      ("http://ex.com/A/b?gclid=z",                          "http://ex.com/A/b"),
      ("http://ex.com:80/p",                                 "http://ex.com/p"),
      ("http://ex.com/p/",                                   "http://ex.com/p"),
      ("http://ex.com/CaseSensitive/Path",                   "http://ex.com/CaseSensitive/Path"),
      ("http://ex.com/p?id=1&fbclid=q#x",                    "http://ex.com/p?id=1"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlDedup.canonicalizeUrl($"url").as("c")).as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, g) =>
      assert(g == want, s"expected $want, got $g")
    }
  }

  test("p44: groups merge genuinely different raw renderings") {
    import spark.implicits._
    val out = UrlDedup.query(spark, "/root/testdata/sf0.001")
    // at least one canonical group holds >1 distinct raw URLs
    val merged = out.groupBy($"canon_url")
      .agg(countDistinct($"url").as("raws"), count(lit(1)).as("n"))
      .filter($"raws" > 1)
    assert(merged.count() > 0, "no group merged distinct raw renderings")
    // decision-record invariants: kept_doc_id is the min of its group,
    // exactly one non-dup per group
    val bad = out.groupBy($"canon_url")
      .agg(min($"doc_id").as("mn"), max($"kept_doc_id").as("mxk"),
           sum(when(!$"is_dup", 1L).otherwise(0L)).as("keepers"))
      .filter($"mn" =!= $"mxk" || $"keepers" =!= 1L)
    assert(bad.count() == 0, "kept_doc_id must be the group min, kept exactly once")
    assert(out.filter($"is_dup").count() > 0, "plant must produce dups")
  }
}
