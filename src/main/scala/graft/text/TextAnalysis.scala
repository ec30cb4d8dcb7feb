package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P8–P11: text analysis over a corpus with a `text` column.
  *
  * Everything here is pure Catalyst column algebra (split / higher-order
  * functions / regexp) — codegen'd, no UDFs, so the ops scale linearly
  * over any number of partitions with zero shuffle (per-row transforms).
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish subword proxy: word chunks + isolated non-word glyphs. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Per-language stopword lists (top function words; public knowledge).
    * Kept tiny so the SQL oracle can mirror them verbatim. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "dans", "est", "pour"),
    "es" -> Seq("el", "los", "las", "y", "que", "una", "en", "es", "para", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "zu"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"),
  )

  private def arrayLit(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** Count of tokens hitting a stopword list (each occurrence counts). */
  def stopwordHits(toksCol: String, ws: Seq[String]): Column =
    expr(s"size(filter($toksCol, x -> array_contains(${arrayLit(ws)}, x)))")

  /** P8: language ID — stopword-hit score per language, priority-ordered
    * argmax (list order breaks ties), 'und' when nothing hits. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withScores = Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .withColumns(stopwords.map { case (l, ws) =>
        // cast long: DuckDB len() is BIGINT, Spark size() is INT
        s"score_$l" -> stopwordHits("toks", ws).cast("long")
      }.toMap)
    val langs = stopwords.map(_._1)
    // priority argmax: first language whose score >= all later ones
    val pred = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      val geAllLater = langs.drop(i + 1)
        .map(o => col(s"score_$l") >= col(s"score_$o"))
        .foldLeft(col(s"score_$l") > 0)(_ && _)
      when(geAllLater, lit(l)).otherwise(els)
    }
    withScores
      .select($"doc_id" +: $"lang" +: langs.map(l => col(s"score_$l")) :+ pred.as("lang_pred"): _*)
      .orderBy($"doc_id")
  }

  /** P9: quality scoring — length / distinctness / stopword-density
    * signals blended into one score. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("n_distinct", size(array_distinct($"toks")))
      .withColumn("avg_token_len",
        round(expr("aggregate(transform(toks, x -> length(x)), 0, (acc, x) -> acc + x)") /
              $"n_tokens", 6))
      .withColumn("distinct_ratio", round($"n_distinct" / $"n_tokens", 6))
      .withColumn("stopword_ratio",
        round(stopwordHits("toks", stopwords.head._2) / $"n_tokens", 6))
      .withColumn("quality_score",
        round(lit(0.4) * ($"n_distinct" / $"n_tokens") +
              lit(0.3) * (lit(1.0) - stopwordHits("toks", stopwords.head._2) / $"n_tokens") +
              lit(0.3) * least(lit(1.0), $"n_tokens" / 100.0), 6))
      .select($"doc_id", length($"text").cast("long").as("n_chars_calc"),
              $"n_tokens".cast("long"), $"n_distinct".cast("long"),
              $"avg_token_len", $"distinct_ratio",
              $"stopword_ratio", $"quality_score")
      .orderBy($"doc_id")
  }

  /** P10: token counting — whitespace + BPE-ish regex counts. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
              size(tokens($"text")).cast("long").as("ws_tokens"),
              size(bpeTokens($"text")).cast("long").as("bpe_tokens"))
      .orderBy($"doc_id")
  }

  /** P11 (SQL-mirrored variant): order/duplication-insensitive content
    * fingerprint — md5 of the sorted distinct token bag. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
              md5(array_join(array_sort(array_distinct(tokens($"text"))), " "))
                .as("fp"))
      .orderBy($"doc_id")
  }

  /** P11 (native variant, spec-tested): winnowing-style shingle min-hash —
    * murmur3 over each 3-token shingle, keep the minimum. Engine-local
    * (no SQL oracle; Spark's hash() is murmur3 with Spark's seeding). */
  def shingleMinHash(df: DataFrame, textCol: String = "text", k: Int = 3): DataFrame =
    df.withColumn("toks", tokens(col(textCol)))
      .withColumn("fp_min",
        expr(s"array_min(transform(sequence(0, greatest(size(toks) - $k, 0)), " +
             s"i -> hash(concat_ws(' ', slice(toks, i + 1, $k)))))"))
      .drop("toks")
}
