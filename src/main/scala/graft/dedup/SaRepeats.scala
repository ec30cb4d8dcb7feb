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
  * Exactness: rank labels are engine-local (Spark packs or densifies,
  * DuckDB uses dense_rank), but every output is a COUNT over
  * rank-equality classes — invariant under any injective relabeling —
  * so the hash gate is exact with no collision caveat (unlike hashed
  * k-gram counting, a rank is never lossy).
  *
  * Scale shape: see [[repLadder]] — pairs come from a positional
  * `lead()` window (one shuffle, never a self-join), labels pack as
  * r1·bound+r2 (a narrow map) on most rounds and densify contiguously
  * only when the packed range would overflow (2 of 7 rounds at the
  * measured decade), and levels round-trip through temp parquet so
  * heap residency is sort buffers only. No window ever sees a single
  * global partition (docs key the lead; labels key the dup counts;
  * null labels split off so they can't form one skewed partition).
  */
object SaRepeats {

  val MaxLevel = 128 // levels 1,2,4,...,128

  /** Per-doc repeat-start counts from a stored level: positions whose
    * label is duplicated corpus-wide. Doc-sized; materialized eagerly so
    * level files can be dropped. */
  private def repCounts(level: DataFrame, k: Int): DataFrame =
    level.filter(col("dup"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as(s"rep_$k"))
      .localCheckpoint(true)

  /** The repeat ladder: (level -> per-doc rep counts) for levels
    * 1,2,4,...,maxLevel over a (doc_id, pos, ch) frame.
    *
    * Round shape (all measured at the 100x decade, 178M positions):
    *
    *   - PAIRS BY WINDOW, NOT SELF-JOIN: rank_k(p+k) is `lead(r, k)`
    *     over (doc, pos) -- position rows are kept COMPLETE per doc
    *     (tail positions carry null labels), so the lead is positional.
    *     One shuffle+sort instead of the two-sort sort-merge self-join
    *     the first implementation paid twice per round (the probe
    *     showed ~50s/round of pure pair-join recompute).
    *
    *   - PACKED LABELS when they fit: with labels contiguous in
    *     [0, bound), the pair relabels as r1*bound + r2 -- a NARROW
    *     map, exactly injective, no distinct/join-back at all -- as
    *     long as bound^2 < 2^63. Labels grow quadratically, so every
    *     other round DENSIFIES: contiguous labels over the distinct
    *     pair table (range-partition, per-partition row_number + a
    *     collected offset vector -- O(#partitions) driver state), then
    *     one join-back (broadcast when the pair vocabulary is small,
    *     as it is in early rounds: 257 -> 5k -> 183k distinct). Only
    *     2 of 7 rounds pay the densify at the decade.
    *
    *   - DUP FLAG IN-PASS: each level stores (doc_id, pos, r, dup)
    *     where dup = this label occurs >= 2 times (a count window over
    *     the label, null rows split off so the null "group" never
    *     becomes one skewed window partition). rep_k is then a plain
    *     doc-keyed count over the stored level.
    *
    *   - TEMP PARQUET between rounds: level tables are position-sized;
    *     holding them on-heap OOMed a 16 GB heap at the decade (and
    *     lineage doubles per round without a cut -- measured OOM in
    *     plan stringification). Columnar temp storage is also what a
    *     real distributed SA build does between rounds at 100 TB.
    *
    * The final level never feeds another round, so it skips labeling
    * entirely: dup comes straight off a count window over the raw pair.
    *
    * `densifyAbove` exists for the spec: forcing it low exercises the
    * densify path on fixtures that would otherwise always pack. */
  private[graft] def repLadder(chars: DataFrame, maxLevel: Int,
                               densifyAbove: Long = 3000000000L): Seq[(Int, DataFrame)] = {
    val spark = chars.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val tmp = java.nio.file.Files.createTempDirectory("graft_p33c").toString
    def store(df: DataFrame, k: Int): DataFrame = {
      df.write.mode("overwrite").parquet(s"$tmp/lvl_$k")
      spark.read.parquet(s"$tmp/lvl_$k")
    }
    try {
      // level 1: contiguous vocabulary labels -- the char vocabulary is
      // model-sized (all distinct code points), one tiny collect
      val vocab = chars.groupBy($"ch").agg(count(lit(1)).as("nr"))
        .orderBy($"ch").as[(String, Long)].collect()
      val labelDf = broadcast(
        vocab.zipWithIndex.map { case ((c, nr), i) => (c, i.toLong, nr >= 2L) }
          .toSeq.toDF("ch", "r", "dup"))
      var bound = vocab.length.toLong
      var cur = store(
        chars.join(labelDf, "ch").select($"doc_id", $"pos", $"r", $"dup"), 1)
      val out = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)]((1, repCounts(cur, 1)))
      var k = 1
      val wDoc = Window.partitionBy($"doc_id").orderBy($"pos")
      while (2 * k <= maxLevel) {
        val paired = cur.select($"doc_id", $"pos", $"r".as("r1"),
          lead($"r", k).over(wDoc).as("r2"))
        var release: () => Unit = () => ()
        val labeled: DataFrame =
          if (4 * k > maxLevel) {
            // last level: labels never consumed again -- dup straight
            // off a count window over the raw pair
            val wP = Window.partitionBy($"r1", $"r2")
            paired.filter($"r1".isNotNull && $"r2".isNotNull)
              .withColumn("dup", count(lit(1)).over(wP) >= 2)
              .select($"doc_id", $"pos", lit(null).cast("long").as("r"), $"dup")
          } else if (bound <= densifyAbove) {
            // packed: narrow relabel, dup via one count window by label
            val packed = paired
              .withColumn("r", $"r1" * lit(bound) + $"r2")
              .select($"doc_id", $"pos", $"r")
            bound = bound * bound
            val wR = Window.partitionBy($"r")
            packed.filter($"r".isNotNull)
              .withColumn("dup", count(lit(1)).over(wR) >= 2)
              .unionByName(packed.filter($"r".isNull)
                .withColumn("dup", lit(false)))
          } else {
            // densify: contiguous labels over the distinct pair table
            val dist = paired.filter($"r1".isNotNull && $"r2".isNotNull)
              .groupBy($"r1", $"r2").agg(count(lit(1)).as("nr"))
              .repartitionByRange($"r1", $"r2")
              .withColumn("pid", spark_partition_id())
              .persist() // pid must agree between the offsets job and the join
            release = () => { dist.unpersist(false); () }
            val cnts = dist.groupBy($"pid").agg(count(lit(1)).as("n"))
              .orderBy($"pid").as[(Int, Long)].collect()
            var acc = 0L
            val offs = cnts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
            bound = math.max(acc, 1L)
            val offDf = broadcast(offs.toSeq.toDF("pid", "off"))
            val wPid = Window.partitionBy($"pid").orderBy($"r1", $"r2")
            val ranks = dist.join(offDf, "pid")
              .withColumn("r", $"off" + row_number().over(wPid) - 1)
              .select($"r1", $"r2", $"r", ($"nr" >= 2).as("dup"))
            paired.join(ranks, Seq("r1", "r2"), "left")
              .select($"doc_id", $"pos", $"r",
                coalesce($"dup", lit(false)).as("dup"))
          }
        val next = store(labeled, 2 * k)
        release()
        graft.operators.ScaleOps.deleteRecursively(s"$tmp/lvl_$k")
        k = 2 * k
        out += ((k, repCounts(next, k)))
        cur = next
      }
      out.toSeq
    } finally {
      // every rep frame is eagerly materialized (localCheckpoint), so
      // no caller ever re-reads the level files -- drop them all
      graft.operators.ScaleOps.deleteRecursively(tmp)
    }
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
    val levels = repLadder(chars, MaxLevel)
    val perDoc = chars.groupBy($"doc_id").agg(count(lit(1)).as("n_chars"))
    val joined = levels.map(_._2)
      .foldLeft(perDoc)((acc, r) => acc.join(r, Seq("doc_id"), "left"))
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
