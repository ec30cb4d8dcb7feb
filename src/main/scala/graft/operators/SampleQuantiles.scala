package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.2 R28c (q29c): DETERMINISTIC SAMPLE QUANTILE SKETCH — the
  * bottom-k-by-hash companion to q21c's KMV: per group, keep the k rows
  * whose (content-addressed) hash is smallest — a uniform random sample
  * that is a deterministic function of the data (same rows on every
  * engine, retry, and partitioning, and mergeable by re-taking the k
  * smallest of a union) — and read interpolated quantiles off the
  * sorted sample.
  *
  * Why next to q29: t-digest/GK sketch STATE is engine-private (Spark's
  * approx_percentile cannot be replayed by DuckDB — q29 is
  * self-validating by design), but the hash-sample estimate is the
  * same number everywhere, so the driver hash-gates the ESTIMATE.
  * Accuracy is the classic sample-quantile bound (rank error
  * σ = √(p(1−p)/k) quantiles — ~0.022 at p50, k=512), enforced
  * in-query against the exact interpolated percentiles via a >4σ
  * rank band.
  *
  * Scale shape: one narrow hash projection, one per-group top-k window
  * (k rows per group survive), and a bounded per-group sort of ≤ k
  * values — the full value set is never globally sorted (q28's exact
  * path pays the compressed sort; this is the cheap always-on monitor
  * you'd run beside it at 100 TB).
  */
object SampleQuantiles {

  val K = 512

  private def interp(vals: Column, n: Column, p: Double): Column = {
    val pos = (n - lit(1)).cast("double") * lit(p)
    val lo = floor(pos)
    val f = pos - lo
    val vLo = element_at(vals, lo.cast("int") + 1)
    val vHi = coalesce(element_at(vals, lo.cast("int") + 2), vLo)
    round(vLo * (lit(1.0) - f) + vHi * f, 2)
  }

  /** q29c: per-return-flag hash-sample quantiles of extended price,
    * hash-gated; fail-fast rank-band gate vs the exact percentiles. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    // two-level bottom-k: the group key has only ~3 values, so a single
    // per-group window would funnel the WHOLE table through 3 sort
    // partitions (20M rows each at the decade). Level 1 takes each
    // (group, scan-partition)'s local bottom-k — spread over
    // groups × partitions keys — and the global window then ranks only
    // ≤ k × partitions survivors per group. Exact: every global
    // bottom-k row is in its partition's bottom-k (the PqAnn shortlist
    // lemma).
    val wLocal = Window.partitionBy($"l_returnflag", $"pid")
      .orderBy($"h", $"l_orderkey", $"l_linenumber")
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"h", $"l_orderkey", $"l_linenumber")
    val sampled = li
      .withColumn("h",
        conv(substring(md5(concat_ws(":", $"l_orderkey", $"l_linenumber")), 1, 8),
          16, 10).cast("long"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(wLocal))
      .filter($"lrn" <= K)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= K)
      .groupBy($"l_returnflag")
      .agg(sort_array(collect_list($"l_extendedprice")).as("vals"))
      .select($"l_returnflag",
        size($"vals").cast("long").as("n_sample"),
        interp($"vals", size($"vals"), 0.5).as("sp50_price"),
        interp($"vals", size($"vals"), 0.95).as("sp95_price"))
      .orderBy($"l_returnflag")
      .localCheckpoint(true)
    // >4σ rank-band gate: the sampled p50 must land between the exact
    // p40 and p60 values, the sampled p95 between p90 and p99
    val bands = graft.queries.Relational.exactPercentilesOf(li,
      "l_returnflag", "l_extendedprice",
      Seq(0.4 -> "p40", 0.6 -> "p60", 0.9 -> "p90", 0.99 -> "p99"))
    val bad = sampled.join(bands, "l_returnflag")
      .filter($"sp50_price" < $"p40" || $"sp50_price" > $"p60" ||
              $"sp95_price" < $"p90" || $"sp95_price" > $"p99")
      .count()
    require(bad == 0,
      s"q29c: $bad group(s) fell outside the >4-sigma sample-quantile band — sampling broken")
    sampled
  }

  /** DuckDB replay: same content-addressed bottom-k sample (QUALIFY
    * over the md5 order), same sorted-list interpolation arithmetic. */
  val oracleSql: String =
    s"""WITH s AS (
         SELECT l_returnflag, l_extendedprice FROM (
           SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                 CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT),
               l_orderkey, l_linenumber) AS rn
           FROM lineitem) t WHERE rn <= $K),
       g AS (
         SELECT l_returnflag, list_sort(list(l_extendedprice)) AS vals
         FROM s GROUP BY l_returnflag),
       q AS (
         SELECT l_returnflag, len(vals) AS n, vals,
           CAST(len(vals) - 1 AS DOUBLE) * 0.5 AS pos50,
           CAST(len(vals) - 1 AS DOUBLE) * 0.95 AS pos95
         FROM g)
       SELECT l_returnflag, CAST(n AS BIGINT) AS n_sample,
         round(vals[CAST(floor(pos50) AS INT) + 1] * (1.0 - (pos50 - floor(pos50)))
           + coalesce(vals[CAST(floor(pos50) AS INT) + 2],
                      vals[CAST(floor(pos50) AS INT) + 1]) * (pos50 - floor(pos50)), 2)
           AS sp50_price,
         round(vals[CAST(floor(pos95) AS INT) + 1] * (1.0 - (pos95 - floor(pos95)))
           + coalesce(vals[CAST(floor(pos95) AS INT) + 2],
                      vals[CAST(floor(pos95) AS INT) + 1]) * (pos95 - floor(pos95)), 2)
           AS sp95_price
       FROM q ORDER BY l_returnflag"""
}
