package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.2 R41 (q43): graph centrality — fixed-iteration PageRank over the
  * customer–supplier interaction graph (who-trades-with-whom, from
  * orders ⋈ lineitem). The data-curation analog is domain/source
  * authority weighting: rank sources by their position in a citation or
  * interaction graph and feed the score into mixture weights.
  *
  * Spark shape (100 TB): the graph lives as an edge DataFrame; one
  * iteration = join(edges, ranks, on src) → groupBy(dst) sum — i.e. one
  * shuffle keyed by vertex per iteration, the standard distributed
  * PageRank dataflow (Pregel/GraphX semantics re-expressed relationally).
  * Degree and rank tables are vertex-sized, edges dominate; every join
  * is keyed on the vertex id, so co-partitioning is reused across the
  * iterations. No driver-side state beyond the vertex count.
  *
  * Determinism (hash-gate): per-edge contributions are floor-quantized
  * to integer picounits (×1e12, the p29/p34 pattern), so the per-vertex
  * sum is an order-independent integer sum and the fixed-point result is
  * bit-identical under any partitioning — and exactly replayable in
  * DuckDB with three chained CTEs.
  */
object PageRank {

  private val Damping = 0.85
  private val Iters   = 3

  /** Fixed-`iters` PageRank on a directed edge list (src, dst) — run on
    * the symmetrized bipartite graph here. Returns (node, pr). */
  def ranks(edges: DataFrame, iters: Int = Iters): DataFrame = {
    // materialize the degree table ONCE (vertex-sized — ONE shuffle over
    // the edges); it then serves three roles with zero further edge
    // scans: the per-edge outdeg join input, the vertex count (local
    // count of a materialized table), and the uniform pr₀ frame. The
    // degree-annotated edge list persists so each iteration is a single
    // join on src + one agg on dst — measured 8.4s → ~2s at sf0.1, and
    // dropping the two redundant full-edge distinct scans (countDistinct
    // for n, distinct for pr₀) cut the cold path by another ~2s.
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val edgesW = edges
      .join(deg.withColumnRenamed("node", "src"), Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    var pr = deg.select(col("node"), (lit(1.0) / lit(n)).as("pr"))
    try {
      for (_ <- 1 to iters) {
        val contrib = edgesW
          .join(pr.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"),
            floor((col("pr") / col("outdeg")) * lit(1e12)).cast("long").as("c"))
        pr = contrib.groupBy("node")
          .agg(sum("c").as("s"))
          .select(col("node"),
            (lit(0.15) / lit(n) +
              lit(Damping) * (col("s").cast("double") / lit(1e12))).as("pr"))
      }
      // materialize the (vertex-sized) result before releasing the edges
      pr.localCheckpoint(true)
    } finally edgesW.unpersist(false)
  }

  /** Symmetrized customer–supplier interaction edge list (who-trades-
    * with-whom, from orders ⋈ lineitem) — shared by q43 (PageRank) and
    * q44 (reachability). Derived ONCE per (process, dir) into a
    * persisted parquet artifact (the p14 clusterTable pattern): the
    * derivation is an orders ⋈ lineitem distinct — the most expensive
    * part of both graph queries — and at 100 TB a graph edge table is
    * exactly the kind of intermediate you materialize once and share. */
  def csEdges(spark: SparkSession, dir: String): DataFrame =
    graft.ProcessArtifacts.table(spark, "cs_edges", dir) {
      deriveCsEdges(spark, dir)
    }

  private[operators] def deriveCsEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val cs = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c:"), $"o_custkey").as("src"),
              concat(lit("s:"), $"l_suppkey").as("dst"))
      .distinct()
    cs.union(cs.select($"dst".as("src"), $"src".as("dst")))
  }

  /** q43: 3-iteration PageRank over the symmetrized customer–supplier
    * graph; every node has degree ≥ 1 by construction (nodes are defined
    * by edges), so there is no dangling-mass term. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ranks(csEdges(spark, dir))
      .select($"node", round($"pr", 9).as("pr"))
      .orderBy($"node")
  }

  val oracleSql: String =
    """WITH e0 AS (
         SELECT DISTINCT 'c:' || o.o_custkey AS src, 's:' || l.l_suppkey AS dst
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       bi AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst AS src, src AS dst FROM e0),
       deg AS (SELECT src AS node, count(*) AS outdeg FROM bi GROUP BY 1),
       nn AS (SELECT count(*) AS n FROM deg),
       pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM deg, nn),
       pr1 AS (
         SELECT b.dst AS node,
           0.15 / any_value(nn.n) + 0.85 *
             (CAST(sum(CAST(floor((p.pr / d.outdeg) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS pr
         FROM bi b JOIN pr0 p ON b.src = p.node
                   JOIN deg d ON b.src = d.node
                   CROSS JOIN nn GROUP BY 1),
       pr2 AS (
         SELECT b.dst AS node,
           0.15 / any_value(nn.n) + 0.85 *
             (CAST(sum(CAST(floor((p.pr / d.outdeg) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS pr
         FROM bi b JOIN pr1 p ON b.src = p.node
                   JOIN deg d ON b.src = d.node
                   CROSS JOIN nn GROUP BY 1),
       pr3 AS (
         SELECT b.dst AS node,
           0.15 / any_value(nn.n) + 0.85 *
             (CAST(sum(CAST(floor((p.pr / d.outdeg) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS pr
         FROM bi b JOIN pr2 p ON b.src = p.node
                   JOIN deg d ON b.src = d.node
                   CROSS JOIN nn GROUP BY 1)
       SELECT node, round(pr, 9) AS pr FROM pr3 ORDER BY node"""
}
