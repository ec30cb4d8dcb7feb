package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DocClustersSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every vector assigned, cluster ids in [0, k)") {
    val n = graft.Tables.embeddings(spark, dir).count()
    val got = DocClusters.query(spark, dir)
    assert(got.count() == n, "every corpus vector must get a cluster")
    val (lo, hi) = got.agg(min($"cluster"), max($"cluster"))
      .as[(Int, Int)].head()
    assert(lo >= 0 && hi < 8, s"cluster ids out of range: [$lo, $hi]")
    assert(got.select("cluster").distinct.count() > 1,
      "degenerate clustering: everything in one cell")
  }

  test("assignment is a narrow map — no shuffle besides the final sort") {
    val df = DocClusters.query(spark, dir)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
      .split("== Initial Plan ==").head
    assert(!plan.contains("hashpartitioning"),
      "p28 assignment must not hash-shuffle (nearest-centroid is per-row)")
    assert(!plan.contains("Join"), "p28 assignment must not join")
  }
}
