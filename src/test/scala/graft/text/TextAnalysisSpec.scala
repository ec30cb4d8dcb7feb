package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("tokens and bpe tokens count words and punctuation") {
    val df = docs(1L -> "hello world, how are you?")
      .select(
        size(TextAnalysis.tokens($"text")).as("ws"),
        size(TextAnalysis.bpeTokens($"text")).as("bpe"))
    val row = df.head()
    assert(row.getInt(0) === 5)           // whitespace chunks
    assert(row.getInt(1) === 7)           // words + ',' + '?'
  }

  test("language id picks the language with most stopword hits") {
    val df = docs(
      1L -> "le chat est dans la maison et le jardin",
      2L -> "the cat is in the house and it is warm",
      3L -> "der hund ist nicht mit der katze zu hause",
      4L -> "xyzzy plugh qwerty")
      .withColumn("toks", TextAnalysis.tokens($"text"))
      .withColumns(TextAnalysis.stopwords.map { case (l, ws) =>
        s"score_$l" -> TextAnalysis.stopwordHits("toks", ws)
      }.toMap)
    val scores = df.select($"doc_id", $"score_fr", $"score_en", $"score_de")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(scores(1L)._1 > scores(1L)._2, "french doc scores fr > en")
    assert(scores(2L)._2 > scores(2L)._1, "english doc scores en > fr")
    assert(scores(3L)._3 > scores(3L)._2, "german doc scores de > en")
    assert(scores(4L) === ((0, 0, 0)), "gibberish scores zero")
  }

  test("bag fingerprint is insensitive to token order and duplication") {
    val df = docs(
      1L -> "alpha beta gamma",
      2L -> "gamma alpha beta beta alpha",
      3L -> "alpha beta delta")
      .select($"doc_id",
        md5(array_join(array_sort(array_distinct(TextAnalysis.tokens($"text"))), " ")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("shingle min-hash is stable for identical text, differs across texts") {
    val df = TextAnalysis.shingleMinHash(docs(
      1L -> "one two three four five",
      2L -> "one two three four five",
      3L -> "six seven eight nine ten"))
    val fps = df.select("doc_id", "fp_min")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("tf-idf ranks a document's rare term above corpus-wide terms") {
    // "zebra" appears once, only in doc 1; "common" appears in every doc
    val df = TfIdf.topTerms(docs(
      1L -> "common zebra",
      2L -> "common common common common",
      3L -> "common filler words here",
      4L -> "common more filler words"), "doc_id", "text", 2)
    val doc1 = df.filter($"doc_id" === 1L).orderBy($"rank")
      .select("term").as[String].collect()
    assert(doc1.head === "zebra",
      s"rare term must outrank the corpus-wide term, got ${doc1.toSeq}")
  }
}
