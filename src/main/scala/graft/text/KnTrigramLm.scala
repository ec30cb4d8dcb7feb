package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 P57 (p57): interpolated Kneser–Ney TRIGRAM language model —
  * the published standard for n-gram LM quality filtering (Chen &
  * Goodman 1999's interpolated absolute discounting; the smoothing
  * KenLM ships and the CCNet/Gopher perplexity filters assume). p29's
  * bigram MLE ranks documents but assigns unseen-context mass nothing;
  * KN is what production filters actually run: discount D from every
  * observed count, redistribute through CONTINUATION counts (how many
  * distinct contexts a word completes — the "San Francisco" fix: a
  * word glued to one context gets low continuation mass no matter how
  * frequent).
  *
  * Formulation (all counts derived from the corpus TRIGRAM table, the
  * self-contained convention — boundary bigrams outside any trigram
  * carry no evidence):
  *   P₁(w₃)      = N₁₊(·w₃) / N₁₊(··)
  *   P₂(w₃|w₂)   = (max(N₁₊(·w₂w₃)−D,0) + D·N₁₊(w₂·)·P₁) / N₁₊(·w₂·)
  *   P₃(w₃|w₁w₂) = (max(c(w₁w₂w₃)−D,0)  + D·N₁₊(w₁w₂·)·P₂) / c(w₁w₂)
  * with the single discount D = 0.75 (exactly representable: 3/4).
  * Each level is a proper distribution: the discounted mass D·N₁₊ is
  * exactly the interpolation weight, so Σ_{w₃} P = 1 per context —
  * spec-verified over the full vocabulary, unseen continuations
  * included.
  *
  * Exactness (hash-gate): every count is an integer aggregate; each
  * trigram's probability is ONE fixed-shape double expression over
  * those integers (no accumulation), quantized to integer micro-nats
  * (−floor(1e6·ln P), floor toward −∞ on both engines) and integer-
  * summed per doc — the p29 discipline, so DuckDB replays hash-exact.
  *
  * Scale shape (100 TB): the model is corpus-derived and corpus-sized —
  * nothing is broadcast. Four shuffled aggregations build the count
  * tables (each with map-side combine), equi-joins assemble the
  * per-type probability, one equi-join scores the docs; AQE broadcasts
  * the small sides at test SF. At 100 TB the join keys become 64-bit
  * n-gram hashes instead of word tuples (the p29 note — collision odds
  * are rounding noise, not a correctness gate); here they stay strings
  * so the oracle groups the exact same domain.
  */
object KnTrigramLm {

  val Discount = 0.75

  /** Count tables from a (w1, w2, w3) trigram-occurrence frame, joined
    * onto `triples` (left joins + coalesce, so unseen trigrams /
    * continuations get their interpolated backoff mass — the spec
    * scores the full vocabulary through this). A triple whose CONTEXT
    * was never observed falls through to the next-lower order (p3 → p2
    * when (w1,w2) is unseen, p2 → p1 when w2 never appears mid-trigram)
    * — the standard backoff-to-lower-order contract, so the API is
    * total over any (w1,w2,w3) and never emits null probabilities.
    * Returns `triples` + integer count columns + p1/p2/p3. */
  def scoreTriples(occs: DataFrame, triples: DataFrame): DataFrame =
    scoreFromCounts(
      occs.groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("t")),
      triples)

  /** KN levels from the distinct-trigram count table `t3`. Every
    * aggregate (c12/cont23/mid/uni) rolls up from `t3`, and the N₁₊(··)
    * normalizer joins in as a 1-row BROADCAST aggregate (the q39b 1-row
    * total idiom) instead of the old `cont23.count()` driver action —
    * that action re-ran the full corpus scan → trigram explode → count
    * chain once per invocation because nothing was persisted, while
    * inside ONE action ReuseExchange computes the t3 shuffle once for
    * all five consumers (guide §1.2: don't run the dominant pass twice;
    * measured: an eager localCheckpoint of t3 was WORSE — distinct
    * trigrams are corpus-sized on natural text, and row-serialized
    * blocks lose to the reused columnar exchange). The division by the
    * joined `tot` column is the same double division as the old
    * `lit(tot.toDouble)`, so p1/p2/p3 are bit-identical. */
  def scoreFromCounts(t3: DataFrame, triples: DataFrame): DataFrame = {
    val c12 = t3.groupBy(col("w1"), col("w2"))
      .agg(sum(col("t")).as("c12"), count(lit(1)).as("n3"))
    val cont23 = t3.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("cont23")) // distinct w1 per (w2,w3)
    val mid = cont23.groupBy(col("w2"))
      .agg(sum(lit(1L)).as("mid_ctx"), sum(col("cont23")).as("mid_den"))
    val uni = cont23.groupBy(col("w3"))
      .agg(count(lit(1)).as("uni")) // distinct w2 per w3
    val tot = cont23.agg(count(lit(1)).cast("double").as("__tot")) // N1+(··)
    val d = lit(Discount)
    val zero = lit(0.0)
    def cnt(c: Column) = coalesce(c, lit(0L)).cast("double")
    triples
      .join(t3, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(cont23, Seq("w2", "w3"), "left")
      .join(mid, Seq("w2"), "left")
      .join(uni, Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("p1", cnt(col("uni")) / col("__tot"))
      .withColumn("p2", when(col("mid_den").isNull, col("p1")).otherwise(
        (greatest(cnt(col("cont23")) - d, zero) + d * col("mid_ctx") * col("p1")) / col("mid_den")))
      .withColumn("p3", when(col("c12").isNull, col("p2")).otherwise(
        (greatest(cnt(col("t")) - d, zero) + d * col("n3") * col("p2")) / col("c12")))
      .drop("__tot")
  }

  /** Trigram occurrences per doc over the whitespace tokens (docs with
    * < 3 tokens carry no trigram evidence and are excluded). */
  private def docTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(toks)-3), i -> struct(toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3))"))
        .as("tg"))
      .select($"doc_id", $"tg.w1".as("w1"), $"tg.w2".as("w2"), $"tg.w3".as("w3"))
  }

  /** p57: per-doc interpolated-KN trigram NLL in integer micro-nats —
    * the perplexity-filter score. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val occ = docTrigrams(spark, dir)
    val t3 = occ.select($"w1", $"w2", $"w3")
      .groupBy($"w1", $"w2", $"w3").agg(count(lit(1)).as("t"))
    // the distinct trigram set IS t3's key set — the old
    // occ.select(...).distinct() re-scanned and re-shuffled the corpus
    // through a SECOND aggregate; deriving types from t3 makes every
    // level roll up from the one exchange ReuseExchange already shares
    val types = t3.select($"w1", $"w2", $"w3")
    val model = scoreFromCounts(t3, types)
      .select($"w1", $"w2", $"w3",
        (-floor(lit(1e6) * log($"p3"))).cast("long").as("nll_micro_tg"))
    occ.join(model, Seq("w1", "w2", "w3"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum($"nll_micro_tg").as("kn_nll_micro"))
      .orderBy($"doc_id")
  }

  val oracleSql: String =
    """WITH toks AS (
         SELECT doc_id, string_split_regex(text, '\s+') AS l FROM documents
       ), tg AS (
         SELECT doc_id,
                unnest([{'w1': l[i], 'w2': l[i+1], 'w3': l[i+2]}
                        for i in range(1, len(l) - 1)]) AS g
         FROM toks WHERE len(l) >= 3
       ), occ AS (
         SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tg
       ), t3 AS (
         SELECT w1, w2, w3, count(*) AS t FROM occ GROUP BY w1, w2, w3
       ), c12 AS (
         SELECT w1, w2, sum(t) AS c12, count(*) AS n3 FROM t3 GROUP BY w1, w2
       ), cont23 AS (
         SELECT w2, w3, count(*) AS cont23 FROM t3 GROUP BY w2, w3
       ), mid AS (
         SELECT w2, count(*) AS mid_ctx, sum(cont23) AS mid_den
         FROM cont23 GROUP BY w2
       ), uni AS (
         SELECT w3, count(*) AS uni FROM cont23 GROUP BY w3
       ), tot AS (
         SELECT CAST(count(*) AS DOUBLE) AS tot FROM cont23
       ), model AS (
         SELECT t3.w1, t3.w2, t3.w3,
           CAST(-floor(1e6 * ln(
             (greatest(CAST(t3.t AS DOUBLE) - 0.75, 0.0)
               + 0.75 * c12.n3 *
                 ((greatest(CAST(cont23.cont23 AS DOUBLE) - 0.75, 0.0)
                    + 0.75 * mid.mid_ctx * (CAST(uni.uni AS DOUBLE) / tot.tot))
                  / mid.mid_den))
             / c12.c12)) AS BIGINT) AS nll_micro_tg
         FROM t3
         JOIN c12 ON t3.w1 = c12.w1 AND t3.w2 = c12.w2
         JOIN cont23 ON t3.w2 = cont23.w2 AND t3.w3 = cont23.w3
         JOIN mid ON t3.w2 = mid.w2
         JOIN uni ON t3.w3 = uni.w3
         CROSS JOIN tot
       )
       SELECT o.doc_id, count(*) AS n_trigrams,
              CAST(sum(m.nll_micro_tg) AS BIGINT) AS kn_nll_micro
       FROM occ o JOIN model m
         ON o.w1 = m.w1 AND o.w2 = m.w2 AND o.w3 = m.w3
       GROUP BY o.doc_id
       ORDER BY o.doc_id"""
}
