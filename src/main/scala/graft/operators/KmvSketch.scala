package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.2 R20c (q21c): KMV DISTINCT-COUNT SKETCH — the k-minimum-values /
  * theta-sketch estimator (Bar-Yossef et al. 2002; Apache DataSketches'
  * theta family): hash every value uniformly into [0, 1), keep only the
  * k smallest hashes, and estimate the distinct count as
  * (k − 1) / U_(k), where U_(k) is the k-th smallest normalized hash.
  *
  * Why this exists next to q21's HLL++: HLL sketch BYTES are
  * engine-private (Spark's HLL++ and DuckDB's HLL give different
  * estimates on the same data — q21 is self-validating by design), but
  * KMV is a DETERMINISTIC function of the value set: same hash → same
  * k-th minimum → same estimate on every engine, every retry, every
  * partitioning. That buys the two properties a production pipeline
  * wants from a sketch: (a) exact cross-engine auditability — the
  * driver hash-gates the ESTIMATE itself, not just a bound; (b)
  * trivially mergeable — union of per-partition k-minimum sets, then
  * re-take the k smallest (what the TakeOrdered below does in one
  * distributed pass), so 100 TB of partial sketches combine loss-free.
  *
  * Scale shape: one narrow hash projection + a distributed
  * top-k-ascending (TakeOrdered — combiner-style per partition, k
  * values to the driver). No shuffle of the value set at all; contrast
  * q21b's exact countDistinct, which shuffles every distinct value.
  *
  * The md5-high-32 hash is the repo's proven cross-engine parity class
  * (the m12b/u21 bucket idiom); the estimate arithmetic is one double
  * division, floor-quantized to micro-units so the gate is integer.
  */
object KmvSketch {

  val K = 256

  /** (k_used, kth_hash, est_micro, exact, rel_err_micro) for the
    * distinct values of `valueCol` — one row, hash-gated end-to-end. */
  def sketch(df: DataFrame, valueCol: String, k: Int = K): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // uniform 32-bit hash of the value — distinct-safe (same value →
    // same hash) and cross-engine exact (md5 hex prefix)
    val hashed = df.select(
        conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val kmin = hashed.orderBy($"h".asc).limit(k)
    val exact = hashed.count()
    val rows = kmin.collect().map(_.getLong(0))
    val kUsed = rows.length
    require(kUsed > 1, s"KMV needs at least 2 distinct values, got $kUsed")
    val kth = rows.max // limit k ascending → max of the kept set = U_(k)
    // estimate: (k-1) / (kth / 2^32); if the corpus has fewer than k
    // distinct values the sketch IS the exact set
    val est =
      if (kUsed < k) kUsed.toDouble
      else (kUsed - 1).toDouble * 4294967296.0 / kth.toDouble
    val relErr = math.abs(est - exact) / exact.toDouble
    // fail-fast quality bound: KMV rel. std. error is ~1/sqrt(k-2)
    // (≈ 0.063 at k=256); 4σ is a structural-breakage tripwire
    require(relErr <= 4.0 / math.sqrt((k - 2).toDouble),
      f"q21c KMV rel error $relErr%.4f breaches 4σ at k=$k — hashing/merge broken")
    Seq((kUsed.toLong, kth, math.floor(est * 1e6).toLong, exact,
         math.floor(relErr * 1e6).toLong))
      .toDF("k_used", "kth_hash", "est_micro", "exact_parts", "rel_err_micro")
  }

  /** q21c: the KMV sketch over lineitem's part keys (q21's domain). */
  def query(spark: SparkSession, dir: String): DataFrame =
    sketch(Tables.lineitem(spark, dir), "l_partkey")

  /** DuckDB replay: same md5-high-32 hashes, same k-th minimum, same
    * floor-quantized estimate and error — the sketch is a deterministic
    * function of the value set, so the ESTIMATE itself is the gate. */
  val oracleSql: String =
    s"""WITH h AS (
         SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
         FROM lineitem),
       km AS (
         SELECT h FROM h ORDER BY h ASC LIMIT $K),
       agg AS (
         SELECT count(*) AS k_used, max(h) AS kth,
                (SELECT count(*) FROM h) AS exact
         FROM km),
       est AS (
         SELECT k_used, kth, exact,
           CASE WHEN k_used < $K THEN CAST(k_used AS DOUBLE)
                ELSE (k_used - 1) * 4294967296.0 / kth END AS e
         FROM agg)
       SELECT CAST(k_used AS BIGINT) AS k_used, kth AS kth_hash,
         CAST(floor(e * 1e6) AS BIGINT) AS est_micro,
         CAST(exact AS BIGINT) AS exact_parts,
         CAST(floor(abs(e - exact) / exact * 1e6) AS BIGINT) AS rel_err_micro
       FROM est"""
}
