package graft.pipeline

import graft.SparkSpec

class ClusterBalanceSpec extends SparkSpec {

  test("p68: every cluster downsamples to the min population, deterministically") {
    val a = ClusterBalance.query(spark, "/root/testdata/sf0.001").collect()
    val b = ClusterBalance.query(spark, "/root/testdata/sf0.001").collect()
    assert(a.sameElements(b), "the cut must be content-addressed")
    assert(a.length == 8, s"8 clusters expected, got ${a.length}")
    val quota = a.map(_.getAs[Long]("n_docs")).min
    a.foreach { r =>
      assert(r.getAs[Long]("n_kept") == quota,
        s"cluster ${r.get(0)}: kept ${r.getAs[Long]("n_kept")} != quota $quota")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[String]("kept_md5").length == 32)
    }
  }
}
