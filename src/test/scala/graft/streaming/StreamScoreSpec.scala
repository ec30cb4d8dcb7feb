package graft.streaming

import graft.SparkSpec
import graft.text.QualityClassifier
import org.apache.spark.sql.functions._

class StreamScoreSpec extends SparkSpec {

  test("narrow HOF margin is bit-identical to the aggregation-based margin under any partitioning") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a quick brown fox jumps over a lazy dog and a cat"),
      (3L, "one"),
      (4L, "data data data data quality quality signal")
    ).toDF("doc_id", "text")
    val rnd = new scala.util.Random(7)
    val w = Array.fill(QualityClassifier.NumFeatures)(rnd.nextGaussian())
    val bias = 0.123
    // aggregation path: feature table → floor-micro dot (batch p34 shape)
    val feat = QualityClassifier.featureTable(docs)
    val warr = array(w.map(lit(_)): _*)
    val agg = feat
      .select($"doc_id",
        floor(element_at(warr, $"bucket" + 1) * $"cnt" * lit(1e6)).cast("long").as("c"))
      .groupBy($"doc_id")
      .agg((sum($"c") + lit(math.floor(bias * 1e6).toLong)).as("margin_micros"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    for (parts <- Seq(1, 3)) {
      val narrow = QualityClassifier
        .marginMicrosNarrow(docs.repartition(parts), w, bias)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(narrow.toSeq == agg.toSeq)
    }
  }

  test("s9 streaming scoring equals batch p34 scoring row for row") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventStreams.s9StreamQualityScore(spark, dir).collect()
    val batch = graft.text.QualityClassifier.query(spark, dir).collect()
    assert(stream.length == batch.length && stream.length == 500)
    stream.zip(batch).foreach { case (s, b) => assert(s == b) }
  }
}
