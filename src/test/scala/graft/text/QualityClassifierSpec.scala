package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hashed feature table: one row per (doc, bucket), tf sums to 1 per doc") {
    val docs = Seq((1L, "a b a c"), (2L, "x")).toDF("doc_id", "text")
    val f = QualityClassifier.featureTable(docs)
    assert(f.groupBy("doc_id", "bucket").count().filter($"count" > 1).count() === 0)
    val sums = f.filter($"bucket" < QualityClassifier.D)
      .groupBy("doc_id").agg(sum($"cnt").as("s"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(sums(1L) - 1.0) < 1e-9 && math.abs(sums(2L) - 1.0) < 1e-9)
    val lens = f.filter($"bucket" === QualityClassifier.D)
      .select("doc_id", "cnt").as[(Long, Double)].collect().toMap
    assert(lens(1L) === 0.04 && lens(2L) === 0.01, "length slot = n_tokens/100")
    val buckets = f.select("bucket").as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < QualityClassifier.NumFeatures))
  }

  test("GD fit: loss decreases monotonically and beats chance on the labels") {
    val feat = QualityClassifier.featureTable(
      graft.Tables.documents(spark, dir))
    val lbl = QualityClassifier.labelTable(spark, dir)
    val (w, bias, losses) = QualityClassifier.fit(feat, lbl)
    assert(losses.head > losses.last, s"loss should fall: $losses")
    assert(losses.sliding(2).forall(p => p(1) <= p.head + 2e-6),
      s"full-batch GD at this lr should descend every step: $losses")
    // scoring accuracy must beat the majority-class baseline
    val warr = array(w.toSeq.map(lit(_)): _*)
    val scored = feat
      .select($"doc_id",
        floor(element_at(warr, $"bucket" + 1) * $"cnt" * lit(1e6)).cast("long").as("c"))
      .groupBy($"doc_id")
      .agg((sum($"c") + lit(math.floor(bias * 1e6).toLong)).as("mm"))
      .join(lbl, Seq("doc_id"))
    val n = scored.count().toDouble
    val correct = scored.filter((($"mm" >= 0) && $"y" === 1) ||
                                (($"mm" < 0) && $"y" === 0)).count().toDouble
    val majority = math.max(
      lbl.filter($"y" === 1).count(), lbl.filter($"y" === 0).count()).toDouble
    assert(correct / n > majority / n + 0.05,
      f"accuracy ${correct / n}%.3f should beat majority ${majority / n}%.3f")
  }

  test("fit is deterministic: two fits give identical weights") {
    val docs = graft.Tables.documents(spark, dir)
    val lbl = QualityClassifier.labelTable(spark, dir)
    val f1 = QualityClassifier.fit(QualityClassifier.featureTable(docs).repartition(7), lbl)
    val f2 = QualityClassifier.fit(QualityClassifier.featureTable(docs).repartition(2), lbl)
    assert(f1._1.toSeq === f2._1.toSeq && f1._2 === f2._2,
      "integer-quantized aggregation must make the fit partition-invariant")
  }
}
