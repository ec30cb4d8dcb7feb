package graft.text

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {

  test("viterbi picks the min-cost segmentation, not greedy longest-match") {
    // greedy longest-match would take 'abc' (cost 9) + 'd' (cost 5) = 14;
    // the optimum is 'ab' + 'cd' = 4 + 4 = 8
    val cost = Map("a" -> 5L, "b" -> 5L, "c" -> 5L, "d" -> 5L,
                   "ab" -> 4L, "cd" -> 4L, "abc" -> 9L)
    assert(UnigramLm.viterbi("abcd", cost).toSeq == Seq("ab", "cd"))
  }

  test("viterbi tie-break prefers the longest piece (the oracle's CASE order)") {
    // 'aa' (4) ties 'a'+'a' (2+2): the longer piece must win, at every
    // position (the oracle's CASE chain tests i = 4 first)
    val cost = Map("a" -> 2L, "aa" -> 4L)
    assert(UnigramLm.viterbi("aaaa", cost).toSeq == Seq("aa", "aa"))
    // and a 3-way tie at the last position resolves to the longest
    val cost2 = Map("x" -> 3L, "xx" -> 6L, "xxx" -> 9L)
    assert(UnigramLm.viterbi("xxx", cost2).toSeq == Seq("xxx"))
  }

  test("viterbi falls back to single code points when no multi-piece helps (coverage)") {
    val cost = Map("q" -> 1L, "r" -> 1L, "s" -> 1L)
    assert(UnigramLm.viterbi("qrs", cost).toSeq == Seq("q", "r", "s"))
    intercept[IllegalArgumentException] {
      UnigramLm.viterbi("qz", cost) // 'z' missing → loud, not silent
    }
  }

  test("code points survive: surrogate pairs are single symbols, never halved") {
    assert(UnigramLm.codePoints("a𝄞b").toSeq == Seq("a", "𝄞", "b"))
    val cost = Map("a" -> 1L, "𝄞" -> 1L, "b" -> 1L, "a𝄞" -> 1L)
    assert(UnigramLm.viterbi("a𝄞b", cost).toSeq == Seq("a𝄞", "b"))
  }

  test("long words pre-chunk at MaxChunkLen code points and segmentation covers each chunk") {
    val w = "ab" * 20 // 40 code points → chunks of 16/16/8
    val ch = UnigramLm.chunksOf(w)
    assert(ch.length == 3)
    assert(ch.map(UnigramLm.codePoints(_).length).toSeq == Seq(16, 16, 8))
    assert(ch.mkString == w)
    val cost = Map("a" -> 2L, "b" -> 2L, "ab" -> 3L)
    val pieces = ch.flatMap(c => UnigramLm.viterbi(c, cost))
    assert(pieces.mkString == w, "segmentation must cover the word exactly")
    assert(pieces.forall(_ == "ab"), "the cheaper bigram piece must win everywhere")
  }

  test("seed pieces enumerate every 1..MaxPieceLen substring with multiplicity") {
    val ps = UnigramLm.seedPieces("aab")
    assert(ps.count(_ == "a") == 2)
    assert(ps.count(_ == "aa") == 1)
    assert(ps.count(_ == "ab") == 1)
    assert(ps.count(_ == "aab") == 1)
    assert(!ps.contains("")) // no empty pieces
  }

  test("p59: whitespace-edged and empty docs — zero-length words dropped, all-empty docs absent") {
    import spark.implicits._
    // split("\\s+") yields empty tokens at whitespace edges; both the
    // Spark side and the oracle drop them identically, and a doc whose
    // every token is empty drops out of the render entirely
    val docs = Seq((1L, "  ab ab  "), (2L, "ab"), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val out = UnigramLm.queryFrom(docs).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_words")).toMap
    assert(byId.keySet == Set(1L, 2L), s"all-empty docs must be absent, got ${byId.keySet}")
    assert(byId(1L) == 2L, s"edge whitespace must not inflate n_words: ${byId(1L)}")
    assert(byId(2L) == 1L)
    // identical word stream → identical render hash regardless of edges
    val md = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pieces_md5")).toMap
    assert(md(1L) != null && md(2L) != null)
  }

  test("p59 fit: every corpus word round-trips through its segmentation, pieces respect MaxPieceLen") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (docWords, _, costs) = UnigramLm.fit(spark, dir)
    val words = docWords.select($"word").distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      val pieces = UnigramLm.chunksOf(w).flatMap(c => UnigramLm.viterbi(c, costs))
      assert(pieces.mkString == w, s"roundtrip failed for '$w': ${pieces.toSeq}")
      pieces.foreach(p => assert(UnigramLm.codePoints(p).length <= UnigramLm.MaxPieceLen))
    }
    // EM actually learned something beyond characters: at least one
    // multi-code-point piece is used on this corpus
    assert(words.exists(w => UnigramLm.chunksOf(w)
      .flatMap(c => UnigramLm.viterbi(c, costs)).exists(_.length > 1)),
      "no multi-character piece survived EM — the model degenerated to characters")
  }

  test("p59 query: one record per document, pieces bounded by words") {
    val rows = UnigramLm.query(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words")),
      "a word is at least one piece")
  }

  test("p59 seed cap bounds the driver-side vocabulary; a non-binding cap changes nothing") {
    import spark.implicits._
    // corpus with MANY distinct qualifying multi pieces: every 4-gram of
    // 40 distinct 8-char words repeated 3× clears MinSeedCount
    val words = (0 until 40).map(i => f"w$i%02dabcd")
    val docs = Seq((1L, (words ++ words ++ words).mkString(" "))).toDF("doc_id", "text")
    val (_, _, uncapped) = UnigramLm.fitFrom(docs, seedCap = Int.MaxValue)
    val nMultiUncapped = uncapped.keysIterator.count(UnigramLm.codePoints(_).length > 1)
    assert(nMultiUncapped > 24, s"fixture must exceed the test cap, got $nMultiUncapped")
    // binding cap: the fitted vocabulary's multi pieces stay <= cap in
    // EVERY round (the EM only ever keeps used ∪ singles, and the seed
    // it starts from is cap-bounded)
    val (_, _, capped) = UnigramLm.fitFrom(docs, seedCap = 24)
    assert(capped.keysIterator.count(UnigramLm.codePoints(_).length > 1) <= 24,
      "cap must bound the multi-piece vocabulary")
    // segmentation still total under the capped vocabulary (singles kept)
    val w = words.head * 1
    assert(UnigramLm.chunksOf(w).flatMap(c => UnigramLm.viterbi(c, capped)).mkString == w)
    // a non-binding cap reproduces the uncapped trajectory exactly —
    // the sf0.01 driver hashes cannot move (204 multi pieces < 4096)
    val (_, _, default) = UnigramLm.fitFrom(docs)
    assert(default == uncapped, "non-binding cap must be a no-op")
  }
}
