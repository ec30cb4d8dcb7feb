package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnServeSpec extends SparkSpec {

  test("s7 serves every query from a pruned candidate set, never the corpus") {
    val dir = "/root/testdata/sf0.001"
    val res = EventStreams.s7StreamAnnServe(spark, dir).collect()
    assert(res.length == 20, "one served row per streamed query vector")
    val corpusN = graft.Tables.embeddings(spark, dir).count()
    res.foreach { r =>
      val nCand = r.getLong(1)
      assert(nCand > 0 && nCand < corpusN,
        s"query ${r.getLong(0)}: candidate set ($nCand) must be a strict subset of the corpus ($corpusN)")
      val cos = r.getDouble(3)
      assert(cos >= -1.0001 && cos <= 1.0001, s"nn cosine out of range: $cos")
    }
    // the persisted index the stream served from must exist and cover
    // the whole corpus (every vector posted to exactly one cell)
    val root = graft.ml.ModelOracles.modelRoot(dir)
    val postings = spark.read.parquet(s"$root/s7_postings")
    assert(postings.count() == corpusN, "postings must cover the corpus")
    assert(postings.select(col("vec_id")).distinct().count() == corpusN,
      "each vector posts to exactly one cell")
  }
}
