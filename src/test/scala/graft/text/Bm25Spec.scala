package graft.text

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "apple apple banana"),
      (2L, "apple banana banana cherry cherry cherry cherry cherry"),
      (3L, "banana cherry"),
      (4L, "durian apple")
    ).toDF("doc_id", "text")
  }

  test("bm25: term frequency raises the score, length normalization damps it") {
    import spark.implicits._
    val queries = Seq((1, "apple")).toDF("query_id", "term")
    val out = Bm25.search(docs, "doc_id", "text", queries, k = 10)
      .orderBy($"rank").collect()
    // docs 1,2,4 contain apple; doc 1 (tf=2, dl=3) must beat doc 2
    // (tf=1, dl=8: longer doc, lower tf) and doc 4 (tf=1, dl=2)
    assert(out.map(_.getLong(1)).head == 1L)
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L, 4L))
    // doc 4 (dl=2) beats doc 2 (dl=8) at equal tf — length normalization
    val r4 = out.find(_.getLong(1) == 4L).get.getLong(2)
    val r2 = out.find(_.getLong(1) == 2L).get.getLong(2)
    assert(r4 < r2)
  }

  test("bm25: rare terms carry more idf than common ones at equal tf and dl") {
    import spark.implicits._
    val queries = Seq((1, "durian"), (2, "banana")).toDF("query_id", "term")
    val out = Bm25.search(docs, "doc_id", "text", queries, k = 1).collect()
    val durianTop = out.find(_.getInt(0) == 1).get.getDouble(3)
    val bananaTop = out.find(_.getInt(0) == 2).get.getDouble(3)
    // durian: df=1 of 4 docs; banana: df=3 — the rare term's best hit
    // scores higher than the common term's best hit
    assert(durianTop > bananaTop)
  }

  test("bm25: multi-term query sums per-term contributions; docs matching both terms rank first") {
    import spark.implicits._
    val queries = Seq((1, "apple"), (1, "banana")).toDF("query_id", "term")
    val out = Bm25.search(docs, "doc_id", "text", queries, k = 10)
      .orderBy($"rank").collect()
    // docs 1 and 2 match both; 3 and 4 match one each — both-matchers first
    assert(out.take(2).map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  test("bm25: corpus-derived query set pairs the top-6 df terms deterministically") {
    import spark.implicits._
    val q = Bm25.corpusQueries(docs, "doc_id", "text")
      .orderBy($"query_id", $"term").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    // df: apple 3, banana 3, cherry 2, durian 1 → only 4 terms exist, so
    // ranks 1..4 = apple, banana (ties df=3, term asc), cherry, durian;
    // pairing (rk-1)%3+1 → q1: apple+durian, q2: banana, q3: cherry
    assert(q.toSet == Set((1, "apple"), (1, "durian"), (2, "banana"), (3, "cherry")))
  }
}
