package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P39: BPE merge learning (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-
  * training stage of an LLM data pipeline, distributed.
  *
  * Algorithm: words (with corpus counts) start as character sequences
  * plus the classic `</w>` end-of-word marker; each step counts adjacent
  * symbol pairs weighted by word count, merges the globally most
  * frequent pair (ties → lexicographically smallest), and repeats.
  *
  * Scale shape (100 TB): the corpus collapses to a WORD-FREQUENCY table
  * in one aggregation — everything after runs on vocabulary-sized data,
  * the classical trick that makes BPE training corpus-size-independent.
  * Per step: pair counting is explode → one keyed integer aggregation
  * (map-side combinable); the argmax is a distributed TakeOrdered of ONE
  * row; the merge application is a NARROW per-row array fold (no
  * shuffle). Driver state is the merge list — M rows.
  *
  * Determinism: pair counts are integer sums (order-independent); the
  * argmax tie-break is total (count desc, left asc, right asc); the
  * merge fold is the standard left-greedy scan, identical in both
  * engines. The DuckDB oracle replays ALL M steps as chained CTEs —
  * each step's argmax depends on every prior merge, so the hash gate
  * certifies the entire iterative trajectory.
  */
object BpeVocab {

  val Merges = 8

  /** Left-greedy merge of adjacent pair (a,b) in a symbol array. */
  private def applyMerge(sym: Column, a: String, b: String): Column =
    aggregate(
      slice(sym, lit(2), size(sym) - 1),
      slice(sym, 1, 1),
      (acc, x) =>
        when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
                 array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))

  /** Learn `merges` BPE merges from a (word, cnt) table; returns the
    * merge table (step, left, right, merged, pair_count). */
  def learn(wordCounts: DataFrame, merges: Int = Merges): DataFrame = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var words = wordCounts
      // Spark's split(limit=-1) keeps a trailing "" on the empty pattern;
      // DuckDB's regexp_split_to_array does not — drop it
      .select(concat(filter(split($"word", ""), x => x =!= lit("")),
                     array(lit("</w>"))).as("sym"), $"cnt")
      .persist()
    words.count()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    for (step <- 1 to merges) {
      val top = words
        .select(explode(arrays_zip(
            slice($"sym", lit(1), size($"sym") - 1).as("l"),
            slice($"sym", lit(2), size($"sym") - 1).as("r"))).as("p"), $"cnt")
        .groupBy($"p.l".as("left"), $"p.r".as("right"))
        .agg(sum($"cnt").as("pair_count"))
        .orderBy($"pair_count".desc, $"left", $"right")
        .limit(1)
        .as[(String, String, Long)]
        .head()
      val (a, b, c) = top
      out += ((step, a, b, a + b, c))
      val next = words.select(applyMerge($"sym", a, b).as("sym"), $"cnt").persist()
      next.count()
      words.unpersist(false)
      words = next
    }
    words.unpersist(false)
    out.toSeq.toDF("step", "left", "right", "merged", "pair_count")
  }

  /** p39: 8 BPE merges learned from the documents corpus. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wc = Tables.documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
    learn(wc).orderBy($"step")
  }

  /** DuckDB replay: 8 chained (words_i → pairs_i → argmax m_i →
    * words_{i+1}) CTE rounds with the same left-greedy fold. */
  val oracleSql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "w0" else s"w${i - 1}"
      s"""p$i AS (
           SELECT pr[1] AS l, pr[2] AS r, sum(cnt) AS c FROM (
             SELECT unnest(list_zip(sym[:-2], sym[2:])) AS pr, cnt FROM $prev) t
           GROUP BY 1, 2),
         m$i AS (
           SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         w$i AS (
           SELECT list_reduce(list_transform(sym, x -> [x]),
             (acc, x) -> CASE WHEN acc[-1] = m$i.l AND x[1] = m$i.r
                              THEN acc[:-2] || [acc[-1] || x[1]]
                              ELSE acc || x END) AS sym, cnt
           FROM $prev, m$i)"""
    }
    val rounds = (1 to Merges).map(round).mkString(",\n       ")
    val selects = (1 to Merges).map(i =>
      s"""SELECT $i AS step, l AS "left", r AS "right", l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM m$i""")
      .mkString("\n       UNION ALL ")
    s"""WITH w0 AS (
         SELECT regexp_split_to_array(word, '') || ['</w>'] AS sym, cnt FROM (
           SELECT word, count(*) AS cnt FROM (
             SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
             FROM documents) t GROUP BY 1)),
       $rounds
       $selects
       ORDER BY step"""
  }
}
