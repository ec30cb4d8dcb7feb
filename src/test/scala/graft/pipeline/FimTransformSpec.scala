package graft.pipeline

import graft.SparkSpec

class FimTransformSpec extends SparkSpec {

  test("p62: spans partition the document — pre+mid+suf word counts sum to n, middle never empty") {
    import spark.implicits._
    val out = FimTransform.query(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    val fim = out.filter(_.getAs[Boolean]("fim"))
    assert(fim.nonEmpty && fim.length < out.length,
      "the 1/2 md5 bucket must split the corpus both ways")
    fim.foreach { r =>
      val n = r.getAs[Long]("n_words")
      val a = r.getAs[Long]("cut_a"); val b = r.getAs[Long]("cut_b")
      assert(0 <= a && a < b && b <= n, s"cuts out of range: a=$a b=$b n=$n")
    }
    out.filterNot(_.getAs[Boolean]("fim")).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("cut_a")) && r.isNullAt(r.fieldIndex("cut_b")),
        "pass-through docs carry no cuts")
    }
  }

  test("p62: empty and whitespace-only docs pass through without nulling the record") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // split("") is [""] so n >= 1 always; the n > 0 guard makes the
    // contract explicit — no row may throw or null out rendered_md5
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val out = FimTransform.transform(docs).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("rendered_md5")),
        s"doc ${r.getLong(0)}: rendered_md5 must never be null")
      val n = r.getAs[Long]("n_words")
      assert(n >= 1, s"split semantics give n >= 1, got $n")
      if (r.getAs[Boolean]("fim")) {
        val a = r.getAs[Long]("cut_a"); val b = r.getAs[Long]("cut_b")
        assert(0 <= a && a < b && b <= n, s"cuts out of range: a=$a b=$b n=$n")
      }
    }
  }

  test("p62: the PSM render is the exact reorder (hand-checked fixture)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // re-derive one fim doc's render by hand from its text + cuts
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rows = FimTransform.query(spark, "/root/testdata/sf0.001")
      .filter($"fim").limit(5).collect()
    rows.foreach { r =>
      val w = docs(r.getAs[Long]("doc_id")).split("\\s+")
      val a = r.getAs[Long]("cut_a").toInt; val b = r.getAs[Long]("cut_b").toInt
      val psm = (Seq(FimTransform.SentPre) ++ w.take(a) ++
        Seq(FimTransform.SentSuf) ++ w.drop(b) ++
        Seq(FimTransform.SentMid) ++ w.slice(a, b)).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(psm.getBytes("UTF-8")).map(x => f"$x%02x").mkString
      assert(md == r.getAs[String]("rendered_md5"),
        s"render mismatch on doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
