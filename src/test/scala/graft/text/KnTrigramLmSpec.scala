package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnTrigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def occsOf(docs: String*) = {
    val rows = docs.flatMap { d =>
      val t = d.split("\\s+")
      (0 to t.length - 3).map(i => (t(i), t(i + 1), t(i + 2)))
    }
    rows.toDF("w1", "w2", "w3")
  }

  test("kn: each context's distribution sums to 1 over the full vocabulary (backoff mass included)") {
    val occ = occsOf("a b c a b d", "b c a b c e", "c a b a b c")
    val contexts = occ.select($"w1", $"w2").distinct()
    val vocab = occ.select($"w3").distinct()
    val all = contexts.crossJoin(vocab) // every (context, w3), seen or not
    val sums = KnTrigramLm.scoreTriples(occ, all)
      .groupBy($"w1", $"w2").agg(sum($"p3").as("s"))
      .select($"s").as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9, s"context mass $s != 1"))
  }

  test("kn: continuation counts beat raw frequency (the San-Francisco fix)") {
    // 'x' occurs 4 times but ONLY after (q r); 'y' occurs 4 times after
    // 4 different contexts. Same raw frequency — y must get the larger
    // unigram continuation probability.
    val occ = occsOf("q r x", "q r x", "q r x", "q r x",
                     "a b y", "c d y", "e f y", "g h y")
    val vocab = occ.select($"w3").distinct()
    val probe = Seq(("zz", "zz")).toDF("w1", "w2").crossJoin(vocab)
    // unseen context (zz zz): mid/c12 are null, but p1 is well-defined
    val p1 = KnTrigramLm.scoreTriples(occ, probe)
      .select($"w3", $"p1").as[(String, Double)].collect().toMap
    assert(p1("y") > p1("x"), s"p1(y)=${p1("y")} !> p1(x)=${p1("x")}")
  }

  test("kn: discounting moves mass from seen trigrams to the backoff (seen P < MLE)") {
    val occ = occsOf("a b c a b c a b d")
    val seen = Seq(("a", "b", "c")).toDF("w1", "w2", "w3")
    val p3 = KnTrigramLm.scoreTriples(occ, seen).select($"p3").as[Double].head()
    // MLE would be c(abc)/c(ab) = 2/3; KN discounts each seen type
    assert(p3 < 2.0 / 3.0 && p3 > 0.0)
  }

  test("kn: unseen contexts back off to the lower order instead of going null") {
    val occ = occsOf("a b c a b d", "b c a b c e")
    // (z,z) was never a context; z never appears mid-trigram — p3 must
    // equal p2 must equal p1 (the unigram continuation mass), not null
    val novel = Seq(("z", "z", "c"), ("z", "z", "zz")).toDF("w1", "w2", "w3")
    val got = KnTrigramLm.scoreTriples(occ, novel)
      .select($"w3", $"p1", $"p2", $"p3").collect()
    got.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3),
        s"null probability for novel context: $r")
      assert(r.getDouble(3) === r.getDouble(1), "p3 must back off to p1 for a fully novel context")
      assert(r.getDouble(2) === r.getDouble(1), "p2 must back off to p1 when w2 is never mid-trigram")
    }
    // and a SEEN middle word under an unseen (w1,w2): p3 backs off to a
    // REAL p2 (bigram evidence survives even when the full context is new)
    val half = Seq(("z", "b", "c")).toDF("w1", "w2", "w3")
    val h = KnTrigramLm.scoreTriples(occ, half)
      .select($"p1", $"p2", $"p3").head()
    assert(h.getDouble(2) === h.getDouble(1), "p3 must equal p2 when only (w1,w2) is unseen")
    assert(h.getDouble(1) !== h.getDouble(0), "p2 must carry bigram evidence, not collapse to p1")
  }

  test("p57 query: every doc with >= 3 tokens gets a positive integer NLL") {
    val out = KnTrigramLm.query(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"n_trigrams", $"kn_nll_micro")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, n, nll) => assert(n > 0 && nll > 0) }
  }
}
