package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshTuningSpec extends SparkSpec {
  import spark.implicits._

  test("p2b: candidate splits enumerate the divisors, thresholds are the analytic curve") {
    assert(LshTuning.candidates(64).toSet ==
      Set((1, 64), (2, 32), (4, 16), (8, 8), (16, 4), (32, 2), (64, 1)))
    val t = LshTuning.tuningTable(spark, 0.8).collect()
    assert(t.length == 7)
    t.foreach { r =>
      val b = r.getAs[Long]("bands").toDouble
      val rr = r.getAs[Long]("rows_per_band").toDouble
      val want = math.floor(1e6 * math.pow(1.0 / b, 1.0 / rr)).toLong
      assert(r.getAs[Long]("t_micro") == want, s"threshold off for b=$b r=$rr")
    }
    // exactly the minimum-error splits are chosen, and the chosen
    // split's collision threshold is in the target's neighborhood
    val chosen = t.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.nonEmpty)
    val errs = t.map(_.getAs[Long]("err_micro"))
    assert(chosen.forall(_.getAs[Long]("err_micro") == errs.min))
    assert(math.abs(chosen.head.getAs[Long]("t_micro") - 800000L) < 300000L)
  }

  test("p2b: a higher target tau moves the chosen split toward fewer, longer bands") {
    val lo = LshTuning.chosenSplit(spark, 0.3)
    val hi = LshTuning.chosenSplit(spark, 0.9)
    assert(lo._1 > hi._1,
      s"low tau must choose more bands (easier collisions): got $lo vs $hi")
    assert(lo._1 * lo._2 == 64 && hi._1 * hi._2 == 64)
  }

  test("p2b: the chosen banding drives the existing verified-pairs machinery correctly") {
    // crafted corpus: two ~identical docs (J well above tau) and
    // unrelated docs (J ~ 0)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base + " extra"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "unrelated words entirely different content here now then"))
      .toDF("id", "text")
    val (b, r) = LshTuning.chosenSplit(spark, 0.5)
    val hashed = docs.select($"id",
      graft.functions.HashFunctions.token_shingle_hashes($"text", 3).as("sh"))
    val pairs = MinHashDedup.verifiedPairsByHashed(hashed, threshold = 0.5, bands = b,
        rowsPerBand = r)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs under ($b, $r)")
  }
}
