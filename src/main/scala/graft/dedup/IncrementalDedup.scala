package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.HashFunctions

/** §2.3 P35: INCREMENTAL corpus dedup — the continual-refresh shape:
  * an existing corpus is summarized ONCE into a persisted dedup index
  * (content md5 + sorted shingle-hash sets + exploded LSH band keys),
  * and each incoming batch probes that index without ever rescanning
  * the corpus text. This is the operator a training-data pipeline runs
  * every ingestion cycle; p1/p2/p14 dedup a corpus against itself,
  * p26 joins two live tables — here the right side is an ARTIFACT
  * (the m8/u10 persist-and-reuse pattern), which is the only layout
  * that works when the existing corpus is 100 TB and the daily batch
  * is 0.1% of it.
  *
  * Decision record per incoming doc: exact duplicate (md5 hit in the
  * index), nearest near-dup (min existing id at token-shingle Jaccard
  * ≥ τ via band-key probe + exact verify), best Jaccard, and the final
  * keep/drop bit.
  *
  * Scale shape: the index probe is an equi-join on (band_idx,
  * band_key) against the persisted band table — at scale that table is
  * bucketed by band key so the probe co-locates; candidates dedup to
  * (incoming, existing) pairs before the verify join pulls the two
  * shingle sets (merge-hinted, never broadcast — fat arrays); the md5
  * layer is a broadcast-or-shuffle equi-join Catalyst sizes itself.
  * Incoming-batch work is proportional to batch × bucket occupancy,
  * never corpus × corpus. The synthetic split (even ids = existing
  * corpus, odd ids = incoming batch) is deterministic, so the DuckDB
  * oracle replays everything — including the Jaccard layer exactly
  * (banding recall 1.0 on these corpora, validated like P2/P26) — from
  * the raw documents table alone.
  */
object IncrementalDedup {

  val Threshold = 0.8
  val ShingleK = 3

  private def root(dir: String): String = graft.ml.ModelOracles.modelRoot(dir)

  private val indexed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Build + persist the existing-corpus index once per (JVM, dir):
    * `p35_index` (doc_id, md5, sh) and the exploded band table
    * `p35_bands` (band_idx, band_key, rid). */
  def ensureIndexed(spark: SparkSession, dir: String): Unit =
    indexed.synchronized {
      if (!indexed.contains(dir)) {
        import spark.implicits._
        val existing = Tables.documents(spark, dir)
          .filter($"doc_id" % 2 === 0)
          .select($"doc_id", md5($"text").as("md5"),
            HashFunctions.token_shingle_hashes($"text", ShingleK).as("sh"))
          .persist()
        existing.write.mode("overwrite").parquet(s"${root(dir)}/p35_index")
        existing
          .select($"doc_id".as("rid"), posexplode(MinHashDedup.bandKeys($"sh")))
          .select($"pos".as("band_idx"), $"col".as("band_key"), $"rid")
          .write.mode("overwrite").parquet(s"${root(dir)}/p35_bands")
        existing.unpersist(false)
        indexed.add(dir)
      }
    }

  /** p35: dedup the odd-id batch against the persisted even-id index. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ensureIndexed(spark, dir)
    val idx = spark.read.parquet(s"${root(dir)}/p35_index")
    val idxBands = spark.read.parquet(s"${root(dir)}/p35_bands")
    val inc = Tables.documents(spark, dir)
      .filter($"doc_id" % 2 === 1)
      .select($"doc_id", md5($"text").as("md5"),
        HashFunctions.token_shingle_hashes($"text", ShingleK).as("sh"))
      .persist()
    val cand = inc
      .select($"doc_id", posexplode(MinHashDedup.bandKeys($"sh")))
      .select($"doc_id", $"pos".as("band_idx"), $"col".as("band_key"))
      .join(idxBands, Seq("band_idx", "band_key"))
      .select($"doc_id", $"rid").distinct()
    val near = cand
      .join(inc.select($"doc_id", $"sh").hint("merge"), Seq("doc_id"))
      .join(idx.select($"doc_id".as("rid"), $"sh".as("sh_r")).hint("merge"), Seq("rid"))
      .withColumn("j", round(MinHashDedup.jaccardSorted($"sh", $"sh_r"), 6))
      .filter($"j" >= Threshold)
      .groupBy($"doc_id")
      .agg(min($"rid").as("near_dup_of"), max($"j").as("best_jaccard"))
    val exIdx = idx.select($"md5").distinct().withColumn("ex", lit(true))
    val out = inc.select($"doc_id", $"md5")
      .join(exIdx, Seq("md5"), "left")
      .join(near, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"ex", lit(false)).as("exact_dup"),
        $"near_dup_of", $"best_jaccard",
        (coalesce($"ex", lit(false)) === false && $"near_dup_of".isNull).as("keep"))
      .orderBy($"doc_id")
    val res = out.localCheckpoint()
    inc.unpersist(false)
    res
  }

  /** DuckDB oracle: md5 layer + exact cross-parity Jaccard layer (p26's
    * shingle CTE), replayed entirely from the raw documents table. */
  val oracleSql: String =
    """WITH sh AS (
         SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ')
                          for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS s
         FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents)),
       inc AS (SELECT doc_id, md5(text) AS m FROM documents WHERE doc_id % 2 = 1),
       ex  AS (SELECT doc_id, md5(text) AS m FROM documents WHERE doc_id % 2 = 0),
       pairs AS (
         SELECT i.doc_id AS lid, e.doc_id AS rid,
           CAST(len(list_intersect(si.s, se.s)) AS DOUBLE)
             / (len(si.s) + len(se.s) - len(list_intersect(si.s, se.s))) AS jc
         FROM inc i JOIN sh si ON i.doc_id = si.doc_id,
              ex e JOIN sh se ON e.doc_id = se.doc_id),
       nd AS (
         SELECT lid, min(rid) AS near_dup_of, round(max(jc), 6) AS best_jaccard
         FROM pairs WHERE jc >= 0.8 GROUP BY lid),
       exd AS (SELECT DISTINCT i.doc_id FROM inc i JOIN ex e ON i.m = e.m)
       SELECT i.doc_id, (exd.doc_id IS NOT NULL) AS exact_dup,
              nd.near_dup_of, nd.best_jaccard,
              (exd.doc_id IS NULL AND nd.near_dup_of IS NULL) AS keep
       FROM inc i
       LEFT JOIN exd ON i.doc_id = exd.doc_id
       LEFT JOIN nd ON i.doc_id = nd.lid
       ORDER BY i.doc_id"""
}
