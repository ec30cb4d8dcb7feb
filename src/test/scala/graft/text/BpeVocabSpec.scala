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
  test("typed merge application is bit-identical to the chained expression fold (multibyte + chained merges included)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = Seq("aaab", "banana", "abba", "a", "ababab", "bb",
                    "ααβ", "a𝄞b𝄞", "日本語語語")
    // chained, overlapping and never-matching merges — the shapes that
    // distinguish left-greedy sequential semantics from anything else
    val merges = Array(("a", "b"), ("ab", "ab"), ("a", "a"), ("n", "a"),
                       ("b", "na"), ("α", "β"), ("語", "語"), ("ab", "</w>"),
                       ("zz", "qq"))
    val df = words.toDF("word")
    val enc0 = df.withColumn("sym",
      concat(filter(split($"word", ""), x => x =!= lit("")), array(lit("</w>"))))
    val viaExpr = merges.foldLeft(enc0) { case (d, (a, b)) =>
      d.withColumn("sym", BpeVocab.applyMerge(col("sym"), a, b))
    }.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaTyped = BpeVocab.encodeWords(df, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaTyped == viaExpr)
  }

  test("typed merge application: randomized parity fuzz against a local reference fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdαβ語"
    val words = (0 until 200).map(_ =>
      (0 until (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .distinct
    // merges drawn from symbols that actually occur, plus composites
    var pool = alphabet.map(_.toString).toIndexedSeq
    val merges = (0 until 64).map { _ =>
      val a = pool(rnd.nextInt(pool.length)); val b = pool(rnd.nextInt(pool.length))
      pool = pool :+ (a + b)
      (a, b)
    }.toArray
    def localRef(w: String): Seq[String] = {
      var sym = w.split("").filter(_.nonEmpty).toVector :+ "</w>"
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer[String](sym.head)
        sym.tail.foreach { x =>
          if (out.last == a && x == b) out(out.length - 1) = a + b else out += x
        }
        sym = out.toVector
      }
      sym
    }
    val got = BpeVocab.encodeWords(words.toDF("word"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w => assert(got(w) == localRef(w), s"word '$w'") }
  }

  test("encode plan size is independent of the merge count (the production-M gate)") {
    import spark.implicits._
    val df = Seq("alpha", "beta").toDF("word")
    def planNodes(m: Int): Int = {
      val merges = Array.tabulate(m)(i => (s"x$i", s"y$i"))
      var n = 0
      BpeVocab.encodeWords(df, merges).queryExecution.optimizedPlan.foreach(_ => n += 1)
      n
    }
    assert(planNodes(8) == planNodes(4096))
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
