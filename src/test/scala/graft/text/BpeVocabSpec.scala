package graft.text

import graft.SparkSpec

class BpeVocabSpec extends SparkSpec {

  /** Reference BPE (Sennrich alg. 1) on (word, count) pairs. */
  private def referenceBpe(wc: Map[String, Long], merges: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wc.map { case (w, c) => (w.split("").toVector :+ "</w>") -> c }
    (1 to merges).map { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (sym, c) =>
        sym.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
      words = words.map { case (sym, cnt) =>
        val out = scala.collection.mutable.ArrayBuffer[String](sym.head)
        sym.tail.foreach { x =>
          if (out.last == a && x == b) out(out.length - 1) = a + b
          else out += x
        }
        out.toVector -> cnt
      }.groupMapReduce(_._1)(_._2)(_ + _)
      (step, a, b, c)
    }
  }

  test("bpe: learned merges equal the sequential reference algorithm, including tie-breaks and overlap handling") {
    import spark.implicits._
    val wc = Map("aaab" -> 5L, "aab" -> 3L, "banana" -> 4L, "bandana" -> 2L,
                 "abba" -> 7L, "a" -> 10L)
    val df = wc.toSeq.toDF("word", "cnt")
    val got = BpeVocab.learn(df, merges = 6).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val want = referenceBpe(wc, 6)
    assert(got.toSeq == want)
  }

  test("bpe: merged symbol participates in later merges (hierarchical growth)") {
    import spark.implicits._
    // 'abab' repeated: merge 1 = (a,b) → 'ab'; a later merge must combine
    // a MULTI-CHARACTER symbol (e.g. (ab,ab) or (ab,</w>))
    val df = Seq(("abab", 50L), ("ab", 30L)).toDF("word", "cnt")
    val got = BpeVocab.learn(df, merges = 3).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.head == ("a", "b"))
    assert(got.exists { case (l, r) => l.length > 1 || r.length > 1 })
  }
  test("bpe decode inverts encode on every document (roundtrip_ok everywhere)") {
    val out = BpeVocab.decodeQuery(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500)
    assert(out.forall(_.getAs[Boolean]("roundtrip_ok")),
      "some document failed the encode-decode round trip")
    // and the certificate is not vacuous: decoded really derives from
    // the symbols (decoded_md5 column equals source_md5 column)
    assert(out.forall(r =>
      r.getAs[String]("decoded_md5") == r.getAs[String]("source_md5")))
  }

}
