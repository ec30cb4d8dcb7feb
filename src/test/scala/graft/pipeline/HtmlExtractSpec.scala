package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("p43: every planted block classified; all verdict branches exercised") {
    val rows = HtmlExtract.query(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 6L, s"expected 6 planted blocks, got $r")
      assert(r.getLong(2) == 2L, s"nav+footer must both be dropped: $r")
      val total = r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
      assert(total == r.getLong(1), s"verdicts must partition the blocks: $r")
      assert(r.getLong(5) >= 1L, s"first <p> must always be kept: $r")
    }
    assert(rows.exists(_.getLong(3) >= 1L), "no link-dense block dropped")
    assert(rows.exists(_.getLong(4) >= 1L), "no too-short block dropped")
  }

  test("p43: handcrafted page extracts exactly the content blocks, in order") {
    import spark.implicits._
    val page = Seq((1L,
      "<html><body>" +
      "<nav><a href=/>Home</a></nav>" +
      "<p>The quick brown fox jumps over the lazy dog</p>" +
      "<div><a href=/a>click</a> <a href=/b>here now</a></div>" +
      "<p>A second real paragraph with plenty of words inside</p>" +
      "<p>tiny</p>" +
      "<footer>c 2026</footer>" +
      "</body></html>")).toDF("doc_id", "html")
    val r = HtmlExtract.extractFrom(page).collect().head
    assert(r.getLong(1) == 6L)                   // n_blocks
    assert(r.getLong(2) == 2L)                   // nav + footer
    assert(r.getLong(3) == 1L, s"link farm div must drop: $r")
    assert(r.getLong(4) == 1L, s"'tiny' must drop as too_short: $r")
    assert(r.getLong(5) == 2L)                   // both real paragraphs kept
    val expected = "The quick brown fox jumps over the lazy dog " +
      "A second real paragraph with plenty of words inside"
    assert(r.getString(7) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString,
      "kept text must be the two paragraphs joined in document order")
  }

  test("p43: one keyed aggregation, no join in the plan") {
    val opt = HtmlExtract.query(spark, dir).queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"unexpected join:\n$opt")
  }
}
