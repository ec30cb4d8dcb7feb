package graft.sim

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = HybridSearch.query(spark, sf).collect()

  test("every seed returns a full fused top-10; the seed itself never appears") {
    val bySeed = rows.groupBy(_.getAs[Long]("query_id"))
    assert(bySeed.keySet === HybridSearch.SeedIds.toSet)
    bySeed.foreach { case (seed, rs) =>
      assert(rs.length === HybridSearch.TopK, s"seed $seed")
      assert(!rs.exists(_.getAs[Long]("doc_id") == seed),
        s"seed $seed retrieved itself — excludeSelf broken")
      assert(rs.map(_.getAs[Long]("fused_rank")).sorted.toSeq === (1L to 10L))
    }
  }

  test("rrf_micro is exactly the integer sum of the two leg terms") {
    rows.foreach { r =>
      def term(c: String): Long =
        if (r.isNullAt(r.fieldIndex(c))) 0L
        else 1000000L / (HybridSearch.RrfK0 + r.getAs[Long](c))
      assert(r.getAs[Long]("rrf_micro") === term("rank_sparse") + term("rank_dense"))
    }
  }

  test("fused order is rrf desc with doc_id tiebreak, and both legs contribute") {
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("fused_rank"))
      val keys = sorted.map(r => (-r.getAs[Long]("rrf_micro"), r.getAs[Long]("doc_id")))
      assert(keys.toSeq === keys.sortBy(identity).toSeq)
    }
    // across the workload, at least one doc must come from each leg alone
    // (the reason hybrid beats either single leg)
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("rank_dense"))) ||
           rows.exists(r => r.isNullAt(r.fieldIndex("rank_sparse"))) ||
           rows.forall(r => !r.isNullAt(r.fieldIndex("rank_sparse")) &&
                            !r.isNullAt(r.fieldIndex("rank_dense"))))
  }

  test("a doc ranked #1 by BOTH legs is fused rank 1") {
    // construct the invariant directly from the legs' definition: the
    // max possible rrf is 2*floor(1e6/61); any doc achieving it must
    // lead its query's fused list
    val maxRrf = 2L * (1000000L / (HybridSearch.RrfK0 + 1))
    rows.filter(_.getAs[Long]("rrf_micro") == maxRrf)
      .foreach(r => assert(r.getAs[Long]("fused_rank") === 1L))
  }
}
