package graft.text

import graft.SparkSpec

class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("byte map is the published bijection: printable identity, space is Ġ, full roundtrip") {
    assert(ByteBpe.ByteToUnicode('A'.toInt) == 'A')
    assert(ByteBpe.ByteToUnicode('~'.toInt) == '~')
    assert(ByteBpe.ByteToUnicode(32) == 'Ġ') // the famous space marker (U+0120)
    assert(ByteBpe.ByteToUnicode.distinct.length == 256, "mapping must be a bijection")
    // UTF-8 roundtrip on multibyte + emoji + astral-plane input
    for (s <- Seq("hello", " world", "naïve", "日本語", "🎉🎊", "a𝄞b", "тест", "'s"))
      assert(ByteBpe.byteUnmap(ByteBpe.byteMap(s)) == s, s"roundtrip broke on '$s'")
    // every mapped char is 1 char per BYTE: 🎉 is 4 UTF-8 bytes
    assert(ByteBpe.byteMap("🎉").length == 4)
    assert(ByteBpe.byteSyms("🎉").length == 4)
  }

  test("pretokenizer: contractions split first, categories split runs, Ġ convention on word 2+") {
    val docs = Seq((1L, "it's can't b2b  x!!y"), (2L, "solo")).toDF("doc_id", "text")
    val pt = ByteBpe.pretokens(docs)
      .orderBy($"doc_id", $"pos", $"pidx")
      .select($"doc_id", $"pretok").as[(Long, String)].collect()
    val doc1 = pt.filter(_._1 == 1L).map(_._2).toSeq
    // "it's" → it + 's ; "can't" → can + 't ; "b2b" → b 2 b ; "x!!y" → x !! y
    // double space normalizes to one; words 2+ carry the leading space
    assert(doc1 == Seq("it", "'s", " can", "'t", " b", "2", "b", " x", "!!", "y"), s"got $doc1")
    assert(pt.filter(_._1 == 2L).map(_._2).toSeq == Seq("solo"))
  }

  test("p39d query: every doc roundtrips losslessly and the render is deterministic") {
    val out = ByteBpe.query(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"doc ${r.getAs[Long]("doc_id")}: byte-level decode failed the lossless contract")
      assert(r.getAs[Long]("n_tokens") <= // tokens never exceed bytes
        r.getAs[Long]("n_pretokens") * 64)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_pretokens"))
    }
  }

  test("p39d on multibyte corpus: emoji and CJK survive the full learn→encode→decode cycle") {
    val docs = Seq(
      (1L, "héllo héllo wörld 🎉"), (2L, "日本語 テスト 🎉 🎉"),
      (3L, "plain ascii here"), (4L, "mixé 🎊 here héllo")).toDF("doc_id", "text")
    val out = ByteBpe.queryFrom(docs).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"doc ${r.getAs[Long]("doc_id")} lost bytes in the multibyte cycle")
    }
  }
}
