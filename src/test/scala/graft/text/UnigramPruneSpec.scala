package graft.text

import graft.SparkSpec

class UnigramPruneSpec extends SparkSpec {
  import spark.implicits._

  test("altCost excludes the whole piece: a cheap self cost never masks the replacement cost") {
    // 'ab' itself costs 1, but its best REPLACEMENT is a+b = 10+10
    val cost = Map("a" -> 10L, "b" -> 10L, "ab" -> 1L)
    assert(UnigramPrune.altCost("ab", cost) == 20L)
    // longer piece: best alternative may reuse OTHER multi pieces
    val cost2 = Map("a" -> 10L, "b" -> 10L, "c" -> 10L, "ab" -> 5L, "abc" -> 1L)
    assert(UnigramPrune.altCost("abc", cost2) == 15L) // ab + c
    // and the excluded candidate is ONLY the whole string — a proper
    // prefix equal in length to a sub-span is fine
    val cost3 = Map("x" -> 7L, "xx" -> 3L, "xxx" -> 1L)
    assert(UnigramPrune.altCost("xxx", cost3) == 10L) // xx + x
  }

  test("p59b fit: prune reaches the target, singles survive, rounds self-limit at the target") {
    val docs = Seq.tabulate(40)(i => (i.toLong, s"alpha beta gamma delta${i % 4} zz"))
      .toDF("doc_id", "text")
    // target 20 (above the 15-single coverage floor) with a generous
    // cap: prune MUST discard multi pieces down to exactly the target
    val (_, cost) = UnigramPrune.fitPruned(docs, seedCap = 500, target = 20, rounds = 16)
    val singles = cost.keys.filter(p => p.codePointCount(0, p.length) == 1)
    assert(cost.size == 20, s"fit stopped at |V|=${cost.size}, want the target 20")
    // every corpus char must still be coverable
    val corpusChars = "alpha beta gamma delta0123 zz".replace(" ", "").toSet
    assert(corpusChars.forall(c => cost.contains(c.toString)),
      "a single code point was pruned — coverage broken")
    assert(singles.nonEmpty && singles.size < 20)
    // with a target larger than the whole seed, nothing is ever dropped
    val (_, costAll) = UnigramPrune.fitPruned(docs, seedCap = 500, target = 100000, rounds = 3)
    val (_, costAll2) = UnigramPrune.fitPruned(docs, seedCap = 500, target = 100000, rounds = 1)
    assert(costAll.keySet == costAll2.keySet, "no-drop rounds must not change the vocabulary")
  }

  test("p59b fit: the seed cap binds and keeps the HIGHEST-count multi pieces") {
    val docs = Seq.tabulate(30)(i => (i.toLong, "common common common rare" + i))
      .toDF("doc_id", "text")
    val (_, uncapped) = UnigramPrune.fitPruned(docs, seedCap = 100000, target = 100000, rounds = 1)
    val (_, capped) = UnigramPrune.fitPruned(docs, seedCap = 5, target = 100000, rounds = 1)
    val multiU = uncapped.keys.filter(p => p.codePointCount(0, p.length) > 1).toSet
    val multiC = capped.keys.filter(p => p.codePointCount(0, p.length) > 1).toSet
    assert(multiC.size == 5 && multiU.size > 5, s"cap must bind: ${multiC.size} of ${multiU.size}")
    assert(multiC.subsetOf(multiU))
    // 'co'/'om'/'mm' style substrings of the dominant word must be the
    // survivors — every capped piece comes from 'common'
    assert(multiC.forall(p => "common".contains(p)), s"capped kept $multiC")
  }

  test("p59b query: render is deterministic, n_vocab hits the target, pieces cover every word") {
    val out1 = UnigramPrune.query(spark, "/root/testdata/sf0.001").collect()
    val out2 = UnigramPrune.query(spark, "/root/testdata/sf0.001").collect()
    assert(out1.length == 500)
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq, "nondeterministic render")
    out1.foreach { r =>
      assert(r.getAs[Long]("n_vocab") == UnigramPrune.Target.toLong,
        s"vocab ${r.getAs[Long]("n_vocab")} != target ${UnigramPrune.Target}")
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"))
    }
  }
}
