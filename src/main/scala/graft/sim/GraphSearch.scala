package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GraftFunctions, VectorOps}

/** §2.3 P67b (p67b): SERVING the NN-descent k-NN graph — greedy
  * best-first search (the query half of every graph-ANN system:
  * HNSW/NSG search, Dong et al.'s online queries). p67 builds the
  * graph; this answers "top-k neighbors of q" by walking it:
  *
  *   entry: a SET of S md5-seeded nodes per query (rank-space, the
  *     p67 lesson — ids are not dense), scored exactly, and the beam
  *     starts from the best of them. Multi-seeding is load-bearing,
  *     not decoration: a flat k-NN graph over clustered data is
  *     component-DISCONNECTED (every node's top-k stays in its
  *     cluster), so a single random entry strands the walk in the
  *     wrong component — measured 0.09 recall on the 8-cluster
  *     fixture. S=32 seeds cover a missing component with
  *     P(miss) = (1-1/C)^S ≈ 1.4% at C=8 (this is EFANNA/NSG-class
  *     seeding; HNSW solves the same problem with its layer
  *     hierarchy, Vamana with a medoid entry);
  *   hop: expand the current BEAM (the best B visited nodes by exact
  *     cosine to the query) one step through the UNDIRECTED edge list
  *     (symmetrized — reverse edges are what make a k-NN graph
  *     navigable), score the newcomers with the exact fused cosine,
  *     re-take the beam from everything visited. H fixed hops, so the
  *     oracle unrolls the walk statically (the p67/NN-descent round
  *     discipline);
  *   answer: the top-k of ALL visited nodes (query's own node
  *     excluded).
  *
  * Persist-and-replay (p28/p7b discipline): the graph is built once
  * per JVM, written to parquet, and BOTH engines read that same edge
  * list — entry seeding, beam cuts, every hop's frontier, and the
  * final ranking are then pure deterministic arithmetic, so the
  * driver hash-gates the complete walk, not just row counts. This
  * closes the fourth ANN path the way IVF was closed (p7b fit →
  * u10 layout → s7 serving): p67 fit → p67b serving.
  *
  * Scale shape: the beam state is Q·B rows (panel-bounded) and is
  * BROADCAST to each hop's edge join — the n·k edge list never
  * shuffles, never moves; vector fetches are equi-joins on id. Each
  * hop touches ≤ Q·B·k candidate edges. At 100 TB the edge list is
  * the p67 artifact already on disk, so serving cost is independent
  * of corpus bytes — the property that makes graph ANN the standard
  * billion-scale serving layer.
  *
  * The query FAILS FAST unless panel recall@k vs exact brute force
  * clears 10x the random baseline (p67's scale-invariant lift gate);
  * the spec pins absolute recall >= 0.9 on the clustered fixture.
  */
object GraphSearch {

  val Beam = 4
  val Hops = 3
  val TopK = 5
  val Panel = 32
  val Seeds = 32

  private def md5Bucket(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** p67's persisted graph (built once per (dir, k) per JVM — shared
    * with p67's own fit query; see [[NnDescent.graphPath]]). */
  private[graft] def graphPath(spark: SparkSession, dir: String, k: Int = NnDescent.K): String =
    NnDescent.graphPath(spark, dir, k)

  /** Greedy best-first walk of graph `g` (node_id, neighbor_id) over
    * corpus `e` (vec_id, embedding) for every query in `queries`
    * (qid + qvec). Returns (query_id, neighbor_id, rank, cos_sim) —
    * the top-`topK` visited nodes per query. */
  private[graft] def search(e: DataFrame, g: DataFrame, queries: DataFrame,
                            beam: Int = Beam, hops: Int = Hops,
                            topK: Int = TopK): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val n = e.count()
    val vecs = e.select($"vec_id".cast("long").as("node"),
      VectorOps.toDoubleArray($"embedding").as("nv"))
    val qv = queries.select(col("qid").cast("long").as("qid"),
      VectorOps.toDoubleArray(col("qvec")).as("qv"))
    val und = g.select($"node_id".as("src"), $"neighbor_id".as("nbr"))
      .unionByName(g.select($"neighbor_id".as("src"), $"node_id".as("nbr")))
      .distinct()
      .persist()
    // rank-space multi-seed entry set: nodes with
    // rk = md5("seed:"+qid+":"+j) mod n, j = 1..S (see header: one
    // seed strands the walk in a disconnected component)
    val ranked = e.select($"vec_id".cast("long").as("node")).orderBy($"node")
      .as[Long].rdd.zipWithIndex().map { case (id, r) => (id, r) }.toDF("node", "rk")
    val entry = qv.select($"qid")
      .crossJoin(spark.range(1, Seeds + 1).toDF("j"))
      .select($"qid",
        pmod(md5Bucket(concat_ws(":", lit("seed"), $"qid", $"j")), lit(n)).as("rk"))
      .join(ranked, "rk").select($"qid", $"node").distinct()
    def scored(cand: DataFrame): DataFrame =
      cand.join(vecs, "node").join(broadcast(qv), "qid")
        .withColumn("cos", GraftFunctions.cosine_sim($"qv", $"nv"))
        .select($"qid", $"node", $"cos")
    var visited = scored(entry).localCheckpoint(true)
    val wBeam = Window.partitionBy($"qid").orderBy($"cos".desc, $"node")
    for (_ <- 1 to hops) {
      val beamDf = visited
        .withColumn("brn", row_number().over(wBeam)).filter($"brn" <= beam)
        .select($"qid", $"node")
      visited = visited.unionByName(scored(hopFrontier(und, beamDf, visited)))
        .localCheckpoint(true)
    }
    und.unpersist(false) // visited is checkpointed; the edge cache can go
    visited.filter($"node" =!= $"qid")
      .withColumn("rank", row_number().over(wBeam).cast("long"))
      .filter($"rank" <= topK)
      .select($"qid".as("query_id"), $"node".as("neighbor_id"), $"rank",
              round($"cos", 6).as("cos_sim"))
      .orderBy($"query_id", $"rank")
  }

  /** One hop of the walk: expand the beam (Q·B rows — BROADCAST it; the
    * n·k edge list stays put, never shuffles) one step through the
    * undirected edges. Dedup BEFORE the visited-exclusion (anti-join =
    * set semantics): a node reached through several beam edges arrives
    * as multiple copies, and a bag-difference (exceptAll) would leave
    * the surplus copies alive, re-adding an already-visited node — the
    * duplicate-rank bug the oracle's DISTINCT + NOT EXISTS caught. */
  private[graft] def hopFrontier(und: DataFrame, beamDf: DataFrame,
                                 visited: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    und.join(broadcast(beamDf), und("src") === beamDf("node"))
      .select($"qid", $"nbr".as("node"))
      .distinct()
      .join(visited.select($"qid", $"node"), Seq("qid", "node"), "left_anti")
  }

  /** p67b: serve an md5-picked ~32-query panel over the persisted p67
    * graph; hash-gated end-to-end, recall-lift gate in-query. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val every = math.max(1L, n / Panel)
    val panel = e.filter(
        pmod(md5Bucket(concat(lit("p67b:"), $"vec_id".cast("string"))), lit(every)) === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val g = spark.read.parquet(graphPath(spark, dir))
    val out = search(e, g, panel).localCheckpoint(true)
    // lift gate (p67's discipline): graph-walk recall must beat 10x the
    // random-pick baseline; absolute recall is pinned on the clustered
    // fixture in the spec, where the graph has real structure to walk
    val exact = Knn.bruteForce(e, panel.select($"qid".as("vec_id"), $"qvec".as("embedding")),
        "vec_id", "embedding", TopK)
      .select($"query_id", $"neighbor_id")
    val hit = out.select($"query_id", $"neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"), "leftsemi").count()
    val total = out.count()
    val recall = hit.toDouble / math.max(total, 1L)
    val baseline = TopK.toDouble / math.max(n - 1, 1L)
    require(recall >= 10.0 * baseline,
      f"p67b panel recall $recall%.4f below 10x the random baseline $baseline%.2e — graph walk broken")
    out
  }

  /** DuckDB replay of the whole walk from the persisted edge list:
    * same md5 panel + entries, H statically-unrolled hops with the
    * same beam cut and cosine, same final ranking. */
  val oracleSql: String = {
    val cos =
      """list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
    // score a (qid, node) CTE: exact cosine query→node
    def scored(in: String, out: String) =
      s"""$out AS (
           SELECT v.qid, v.node, $cos AS cos
           FROM $in v
           JOIN embeddings a ON a.vec_id = v.qid
           JOIN embeddings b ON b.vec_id = v.node)"""
    def hop(i: Int) =
      s"""beam$i AS (
           SELECT qid, node FROM (
             SELECT qid, node,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, node) AS brn
             FROM sv${i - 1}) t WHERE brn <= $Beam),
         f$i AS (
           SELECT DISTINCT b.qid, u.nbr AS node
           FROM beam$i b JOIN und u ON u.src = b.node
           WHERE NOT EXISTS (SELECT 1 FROM sv${i - 1} s
                             WHERE s.qid = b.qid AND s.node = u.nbr)),
         ${scored(s"f$i", s"sf$i")},
         sv$i AS (SELECT * FROM sv${i - 1} UNION ALL SELECT * FROM sf$i)"""
    s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
       ranked AS (
         SELECT CAST(vec_id AS BIGINT) AS node,
           row_number() OVER (ORDER BY CAST(vec_id AS BIGINT)) - 1 AS rk
         FROM embeddings),
       g AS (SELECT node_id, neighbor_id
             FROM read_parquet('/tmp/graft_models/sf0.01/p67_graph/*.parquet')),
       und AS (SELECT node_id AS src, neighbor_id AS nbr FROM g
               UNION
               SELECT neighbor_id AS src, node_id AS nbr FROM g),
       panel AS (
         SELECT CAST(vec_id AS BIGINT) AS qid FROM embeddings
         WHERE CAST(('0x' || substr(md5('p67b:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % greatest(1, (SELECT n FROM nn) // $Panel) = 0),
       entry AS (
         SELECT DISTINCT s.qid, r.node FROM (
           SELECT p.qid,
             CAST(('0x' || substr(md5('seed:' || CAST(p.qid AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
               % (SELECT n FROM nn) AS rk
           FROM panel p, (SELECT unnest(range(1, ${Seeds + 1})) AS j) jj) s
         JOIN ranked r ON r.rk = s.rk),
       ${scored("entry", "sv0")},
       ${(1 to Hops).map(hop).mkString(",\n")}
       SELECT qid AS query_id, node AS neighbor_id, rank, round(cos, 6) AS cos_sim
       FROM (
         SELECT qid, node, cos,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, node) AS rank
         FROM sv$Hops WHERE node <> qid) t
       WHERE rank <= $TopK
       ORDER BY query_id, rank"""
  }
}
