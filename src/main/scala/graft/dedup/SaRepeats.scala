package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P61 (p33c): corpus-repeat detection by PREFIX DOUBLING — the
  * suffix-array construction step of Lee et al.'s ExactSubstr, closing
  * the documented delta in p33/p33b (those find repeats at ONE fixed
  * window length; the paper's suffix array finds repeats at every
  * length). Prefix doubling is the canonical distributed SA algorithm
  * (Manber–Myers; the shape every large-scale SA build uses): round k
  * holds an integer rank per text position such that two positions
  * share a rank iff their k-character prefixes are equal; round 2k
  * re-ranks the pair (rank_k(p), rank_k(p+k)) — so log₂(L) keyed
  * rounds classify every position's repeat structure up to length L
  * with TWO INTEGERS per position per round, never materializing
  * window strings (p33b's windows carry k bytes; at the paper's L=50+
  * granularity ladder this is the memory-honest form).
  *
  * Output: per document, for each ℓ ∈ {1,2,4,…,128}, the number of
  * positions that START a substring of ≥ ℓ characters repeated
  * elsewhere in the corpus (any document, the raw SA semantics —
  * p33's cross-doc-only restriction is a policy layer above this).
  * rep_ℓ is monotone non-increasing in ℓ (spec-pinned), and rep_16
  * equals an independently computed sliding 16-gram duplicate count
  * (spec-pinned — the p33b equivalence, now BOTH directions).
  *
  * Exactness: rank labels are engine-local (Spark assigns them by
  * sorted zipWithIndex, DuckDB by dense_rank), but every output is a
  * COUNT over rank-equality classes — invariant under any injective
  * relabeling — so the hash gate is exact with no collision caveat
  * (unlike hashed k-gram counting, a rank is never lossy).
  *
  * Scale shape: each round is one distinct + one range-sort of the
  * DISTINCT pair table (vocabulary of k-prefixes, shrinking-or-equal
  * per round... bounded by position count) + two position-keyed
  * equi-joins — all shuffles keyed on (doc, pos) or the rank pair; no
  * window function ever sees a single global partition. zipWithIndex
  * over the range-sorted distinct keys is the standard distributed
  * dense-ranking primitive (partition-contiguous ids after a range
  * exchange — O(1) driver state).
  */
object SaRepeats {

  val MaxLevel = 128 // levels 1,2,4,...,128

  /** Injective, deterministic integer label per distinct key pair:
    * range-sort the DISTINCT pairs, zipWithIndex (contiguous ids in
    * global sorted order). Only EQUALITY of labels is consumed
    * downstream, so any injective labeling yields identical counts —
    * determinism here just keeps reruns bit-stable. */
  private def rankPairs(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val distinctKeys = pairs.select($"r1", $"r2").distinct()
      .repartitionByRange(col("r1"), col("r2"))
      .sortWithinPartitions(col("r1"), col("r2"))
    val ranked = distinctKeys.select($"r1", $"r2").as[(Long, Long)].rdd
      .zipWithIndex().map { case ((a, b), i) => (a, b, i) }
    spark.createDataFrame(ranked).toDF("r1", "r2", "r")
  }

  /** Per-position rank tables for levels 1,2,4,…,maxLevel over a
    * (doc_id, pos, ch) frame; returns (level → (doc_id, pos, r)). */
  private[graft] def doublingRanks(chars: DataFrame, maxLevel: Int): Seq[(Int, DataFrame)] = {
    val spark = chars.sparkSession
    import spark.implicits._
    // level 1: rank = label of the character itself
    val charRanks = chars.select($"ch").distinct()
      .repartitionByRange($"ch").sortWithinPartitions($"ch")
      .as[String].rdd.zipWithIndex()
      .toDF("ch", "r")
    // every round references the previous level TWICE (the p and p+k
    // branches) and the pair table twice (rank build + join-back):
    // carried as lineage that doubles per round — an exponential plan
    // tree by level 128 (OOMs in plan stringification long before any
    // data moves). localCheckpoint truncates each level to a LogicalRDD,
    // so plan size stays O(1) per round — the BpeVocab.learn lesson.
    var cur = chars.join(charRanks, "ch").select($"doc_id", $"pos", $"r")
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)]((1, cur))
    var k = 1
    while (2 * k <= maxLevel) {
      val a = cur.select($"doc_id", $"pos", $"r".as("r1"))
      val b = cur.select($"doc_id", ($"pos" - k).as("pos"), $"r".as("r2"))
      // inner join: the (pos+k) row exists iff pos+2k ≤ doc length —
      // exactly the positions that can start a 2k-prefix
      val pairs = a.join(b, Seq("doc_id", "pos")).localCheckpoint(true)
      val next = pairs.join(rankPairs(pairs), Seq("r1", "r2"))
        .select($"doc_id", $"pos", $"r")
        .localCheckpoint(true)
      k = 2 * k
      out += ((k, next))
      cur = next
    }
    out.toSeq
  }

  /** p33c: per-doc repeat-start counts at every power-of-two length —
    * rep_ℓ = positions whose ℓ-char prefix occurs ≥ 2 times in the
    * corpus (any doc, raw suffix-array semantics). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chars = Tables.documents(spark, dir)
      .select($"doc_id",
        posexplode(filter(split($"text", ""), x => x =!= lit(""))))
      .withColumnRenamed("col", "ch")
      .persist()
    val levels = doublingRanks(chars, MaxLevel)
    val perDoc = chars.groupBy($"doc_id").agg(count(lit(1)).as("n_chars"))
    val reps = levels.map { case (k, t) =>
      val dupRanks = t.groupBy($"r").agg(count(lit(1)).as("nr"))
        .filter($"nr" >= 2).select($"r")
      t.join(dupRanks, "r")
        .groupBy($"doc_id").agg(count(lit(1)).as(s"rep_$k"))
    }
    val joined = reps.foldLeft(perDoc)((acc, r) => acc.join(r, Seq("doc_id"), "left"))
    val out = levels.map(_._1).foldLeft(joined) { (df, k) =>
      df.withColumn(s"rep_$k", coalesce(col(s"rep_$k"), lit(0L)))
    }.orderBy($"doc_id")
    val materialized = out.localCheckpoint(true)
    chars.unpersist(false)
    materialized
  }

  /** DuckDB replay: the same doubling recurrence with dense_rank (label
    * values differ from Spark's — equality classes, and therefore every
    * count, are identical), one CTE per level + per-level dup counts. */
  val oracleSql: String = {
    val levels = Iterator.iterate(1)(_ * 2).takeWhile(_ <= MaxLevel).toSeq
    val rounds = levels.tail.map { k =>
      val h = k / 2
      s"""t$k AS (
           SELECT a.doc_id, a.p, dense_rank() OVER (ORDER BY a.r, b.r) AS r
           FROM t$h a JOIN t$h b ON a.doc_id = b.doc_id AND b.p = a.p + $h)"""
    }.mkString(",\n       ")
    val dupCtes = levels.map { k =>
      s"""c$k AS (
           SELECT doc_id, count(*) AS rep_$k FROM (
             SELECT doc_id, p, count(*) OVER (PARTITION BY r) AS nr FROM t$k) x
           WHERE nr >= 2 GROUP BY doc_id)"""
    }.mkString(",\n       ")
    val joins = levels.map(k => s"LEFT JOIN c$k USING (doc_id)").mkString(" ")
    val sel = levels.map(k => s"CAST(coalesce(rep_$k, 0) AS BIGINT) AS rep_$k").mkString(", ")
    s"""WITH ch0 AS (
         SELECT doc_id, regexp_split_to_array(text, '') AS cl FROM documents),
       ch AS (
         SELECT doc_id, unnest([{'p': i - 1, 'ch': cl[i]}
                                for i in range(1, len(cl) + 1)], recursive := true)
         FROM ch0),
       t1 AS (
         SELECT doc_id, p, dense_rank() OVER (ORDER BY ch) AS r FROM ch),
       $rounds,
       $dupCtes,
       nd AS (SELECT doc_id, count(*) AS n_chars FROM ch GROUP BY doc_id)
       SELECT doc_id, n_chars, $sel
       FROM nd $joins
       ORDER BY doc_id"""
  }
}
