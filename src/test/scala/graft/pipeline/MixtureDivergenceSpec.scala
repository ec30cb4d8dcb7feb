package graft.pipeline

import graft.SparkSpec

class MixtureDivergenceSpec extends SparkSpec {

  test("p63: KL is non-negative (up to quantization floor) and zero for a distribution-identical source") {
    val out = MixtureDivergence.query(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // each per-word term floors toward −∞ in pico units, so the sum
      // can sit at most n_vocab picos below the true (≥ 0) KL
      val kl = r.getAs[Long]("kl_pico")
      val vocab = r.getAs[Long]("n_vocab")
      assert(kl >= -vocab, s"KL below the quantization floor: $kl (vocab $vocab)")
    }
    // shares sum to 1
    val share = out.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(share - 1.0) < 1e-6, s"token shares sum to $share")
  }

  test("p63: a skewed source diverges more than a corpus-like one (hand fixture)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // balanced source = the corpus mixture; skewed source = one word only
    val docs = Seq(
      (1L, "a b c d", "balanced"), (2L, "a b c d", "balanced"),
      (3L, "a a a a", "skewed"), (4L, "a b c d", "balanced"))
      .toDF("doc_id", "text", "source")
    val words = docs.select($"source", explode(split($"text", "\\s+")).as("word"))
    val sw = words.groupBy($"source", $"word").agg(count(lit(1)).as("csw"))
    val s = sw.groupBy($"source").agg(sum($"csw").as("ns"))
    val w = sw.groupBy($"word").agg(sum($"csw").as("cw"))
    val n = w.agg(sum($"cw")).head().getLong(0)
    val kl = sw.join(s, "source").join(w, "word")
      .withColumn("term",
        floor(lit(1e12) * ($"csw".cast("double") / $"ns") *
          log(($"csw".cast("double") / $"ns") / ($"cw".cast("double") / lit(n.toDouble))))
          .cast("long"))
      .groupBy($"source").agg(sum($"term").as("kl"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kl("skewed") > kl("balanced"),
      s"skewed source must diverge more: $kl")
    assert(kl("skewed") > 0)
  }
}
