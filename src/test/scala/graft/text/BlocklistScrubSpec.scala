package graft.text

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks

class BlocklistScrubSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  test("automaton ≡ brute force on crafted cases: overlaps, suffixes, multibyte, misses") {
    val cases = Seq(
      (Seq("abc", "bc", "c"), "xabcx"),       // nested suffixes all fire at one end
      (Seq("aa"), "aaaa"),                     // overlapping occurrences: 3 hits
      (Seq("ab", "ba"), "ababab"),             // interleaved overlaps
      (Seq("héllo", "llo"), "héllo héllo"),    // multibyte offsets
      (Seq("𝄞x", "x𝄞"), "a𝄞x𝄞xb"),            // astral-plane code points
      (Seq("zzz"), "zz"),                      // term longer than text
      (Seq("kite", "item", "temp"), "kitemp")  // chained overlaps across terms
    )
    cases.foreach { case (terms, text) =>
      val ac = new BlocklistScrub.Automaton(terms)
      val got = ac.occurrences(cps(text)).sorted
      val want = BlocklistScrub.naiveOccurrences(cps(text), terms).sorted
      assert(got == want, s"terms=$terms text='$text': got $got want $want")
    }
  }

  test("automaton ≡ brute force under randomized fuzz (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val alphabet = "abcd"
      def randStr(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val terms = Seq.fill(5)(randStr(1 + rnd.nextInt(3))).distinct
      val text = randStr(40)
      val got = new BlocklistScrub.Automaton(terms).occurrences(cps(text)).sorted
      val want = BlocklistScrub.naiveOccurrences(cps(text), terms).sorted
      assert(got == want, s"fuzz terms=$terms text=$text")
    }
  }

  test("p64: set-cover masking — every covered code point stars out, count is exact") {
    val docs = Seq((1L, "alpha beta alphabet"), (2L, "nothing here")).toDF("doc_id", "text")
    // blocklist from THIS corpus: all words ≥ 4 cps, ≤ 16 terms; 'alpha'
    // covers inside 'alphabet' too (substring semantics)
    val out = BlocklistScrub.queryFrom(docs).collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    val terms = BlocklistScrub.blocklist(docs)
    assert(terms.contains("alpha") && terms.contains("beta"))
    // doc 1: alpha(5) + beta(4) + alpha-in-alphabet(5) + alphabet(8 — itself
    // a corpus word) overlap; covered = 5 + 4 + 8 = 17
    assert(r1.getAs[Long]("n_masked_cps") == 17, s"got ${r1.getAs[Long]("n_masked_cps")}")
    val expectMasked = "***** **** ********"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expectMasked.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(r1.getAs[String]("masked_md5") == md)
  }

  test("p64 query: deterministic on sf0.001, hits guaranteed by corpus-derived terms") {
    val a = BlocklistScrub.query(spark, "/root/testdata/sf0.001").collect()
    val b = BlocklistScrub.query(spark, "/root/testdata/sf0.001").collect()
    assert(a.length == 500)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.getAs[Long]("n_hits")).sum > 0, "corpus-derived terms must hit")
  }
}
