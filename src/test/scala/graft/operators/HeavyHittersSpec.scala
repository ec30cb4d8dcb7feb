package graft.operators

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  test("q39b: exact twin surfaces exactly the above-threshold keys, and every q39 guarantee target is in it") {
    import spark.implicits._
    val rows = HeavyHitters.exactQuery(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "the planted hot key must clear n/9")
    // threshold semantics: every emitted row is strictly above, and the
    // planted key 0 (a third of the mass) is present and dominant
    rows.foreach(r => assert(r.getAs[Long]("exact_count") > r.getAs[Long]("threshold")))
    assert(rows.head.getAs[Long]("key") == 0L, "hot key must rank first")
    // cross-operator consistency: q39's sketch must have surfaced every
    // key the exact twin proves frequent (the Misra–Gries guarantee)
    val sketchKeys = HeavyHitters.query(spark, "/root/testdata/sf0.001")
      .select($"key").as[Long].collect().toSet
    rows.foreach(r => assert(sketchKeys.contains(r.getAs[Long]("key")),
      s"frequent key ${r.getAs[Long]("key")} missing from the q39 sketch"))
  }

  test("misra-gries keeps guaranteed-frequent items across merges") {
    // 10k rows: key 1 has 40%, key 2 has 20%, the rest spread thin —
    // both heavies sit above the n/(k+1) threshold for k=5
    val data = (0 until 10000).map { i =>
      if (i % 10 < 4) 1L else if (i % 10 < 6) 2L
      else 100L + (i % 97)
    }
    val k = 5
    val parts = data.grouped(500).toSeq
    val sketches = parts.map(p => HeavyHitters.sketchPartition(p.iterator, k))
    val (n, merged) = sketches.reduce((a, b) => HeavyHitters.merge(a, b, k))
    assert(n == 10000)
    val m = merged.toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    // every item above the frequency threshold survives
    exact.filter(_._2 > bound).keys.foreach(key =>
      assert(m.contains(key), s"frequent key $key lost"))
    // never overcounts; undercounts within bound
    m.foreach { case (key, est) =>
      assert(est <= exact(key) && exact(key) - est <= bound,
        s"key $key est $est exact ${exact(key)} bound $bound")
    }
    // merge is associative enough: a different merge ORDER keeps the bound
    val (n2, merged2) = sketches.reverse.reduce((a, b) => HeavyHitters.merge(a, b, k))
    assert(n2 == n)
    merged2.foreach { case (key, est) =>
      assert(est <= exact(key) && exact(key) - est <= bound)
    }
  }
}
