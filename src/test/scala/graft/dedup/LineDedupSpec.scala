package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs: "banner" appears in 3 (>= MinDocs) → stripped everywhere;
  // "shared two" appears in only 2 → kept; unique lines kept in order.
  private def pages = Seq(
    (1L, Seq("banner", "alpha one", "shared two", "omega")),
    (2L, Seq("banner", "beta unique", "shared two")),
    (3L, Seq("gamma", "banner")),
    (4L, Seq("delta solo")),
  ).toDF("doc_id", "ls")

  test("lines in >= minDocs distinct docs are stripped; others kept in order") {
    val out = LineDedup.stripFrom(pages, minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"),
         r.getAs[String]("clean_md5"))).toMap
    assert(out(1L)._1 === 4L && out(1L)._2 === 1L)
    assert(out(2L)._2 === 1L)
    assert(out(3L)._2 === 1L)
    assert(out(4L)._2 === 0L)
    // doc 3 keeps only "gamma"; doc 4 untouched
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(3L)._3 === md5Of("gamma"))
    assert(out(4L)._3 === md5Of("delta solo"))
    assert(out(1L)._3 === md5Of("alpha one\nshared two\nomega"),
      "kept lines must re-render in original position order")
  }

  test("a line repeated WITHIN one doc counts that doc once") {
    val p = Seq(
      (1L, Seq("x", "x", "x")),       // 3 occurrences, 1 doc — not boilerplate
      (2L, Seq("y")),
      (3L, Seq("z")),
    ).toDF("doc_id", "ls")
    val out = LineDedup.stripFrom(p, minDocs = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    assert(out(1L) === 0L, "within-doc repetition is p22's business, not dedup")
  }

  test("planted page: header/footer/cookie stripped, content survives") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet", "srcA"),
      (2L, "kilo lima mike november oscar papa quebec romeo sierra tango", "srcA"),
      (3L, "uniform victor whiskey xray yankee zulu one two three four", "srcA"),
    ).toDF("doc_id", "text", "source")
    val out = LineDedup.stripFrom(LineDedup.plantedLines(docs), minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"))).toMap
    // every doc: header + footer always planted and shared by all 3 docs
    // of srcA → both stripped; 10 tokens → 2 content lines, all unique;
    // cookie line (docs where md5 bucket is even) only reaches 2 docs at
    // most here so it never hits the threshold alone — but if planted in
    // all 3 it would; assert only the guaranteed invariant:
    out.foreach { case (_, (n, rm)) => assert(n >= 4L && rm >= 2L) }
  }

  test("plan shape: dictionary join stays an equi-join, no cartesian") {
    val plan = LineDedup.stripFrom(pages, minDocs = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
