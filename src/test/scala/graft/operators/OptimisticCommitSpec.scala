package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OptimisticCommitSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Double, String)*) =
    rows.toDF("k", "price", "bkt")

  test("u21: lost CAS with disjoint partitions rebases; overlap aborts loudly") {
    val root = java.nio.file.Files.createTempDirectory("occ_spec").toString
    try {
      // base at v1 across two partitions
      val v1 = OptimisticCommit.commit(
        df((1L, 1.0, "p0"), (2L, 2.0, "p1")), root, "bkt", 0)
      assert(v1 == 1)
      // writer A and writer B both read v1; A lands first on p0
      val va = OptimisticCommit.commit(df((1L, 10.0, "p0")), root, "bkt", 1)
      assert(va == 2)
      // B touches p1 only: its CAS on v2 is lost, interleaved commit
      // touched {p0} — disjoint — so B rebases and commits v3
      val vb = OptimisticCommit.commit(df((2L, 20.0, "p1")), root, "bkt", 1)
      assert(vb == 3, s"disjoint writer must rebase to v3, got v$vb")
      // writer C also read v1 but touches p0 — overlaps A's commit
      val e = intercept[IllegalStateException](
        OptimisticCommit.commit(df((1L, 99.0, "p0")), root, "bkt", 1))
      assert(e.getMessage.contains("p0"), e.getMessage)
      // resolved state: per partition the highest committed version
      val got = OptimisticCommit.read(spark, root, "bkt")
        .select($"k", $"price").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 10.0), (2L, 20.0)), s"got $got")
      // C's burned claim (v4) must NOT surface as a committed version
      assert(OptimisticCommit.currentVersion(root) == 3)
    } finally ScaleOps.deleteRecursively(root)
  }

  test("u21: a claim without a done marker (crashed writer) is invisible to readers") {
    val root = java.nio.file.Files.createTempDirectory("occ_spec3").toString
    try {
      OptimisticCommit.commit(df((1L, 1.0, "p0")), root, "bkt", 0)
      // simulate a crash: claim v2 but never finish
      assert(OptimisticCommit.tryClaim(root, 2))
      assert(OptimisticCommit.currentVersion(root) == 1)
      val got = OptimisticCommit.read(spark, root, "bkt")
        .select($"price").as[Double].collect().toSeq
      assert(got == Seq(1.0))
      // the next writer simply rebases past the burned version
      val v = OptimisticCommit.commit(df((1L, 5.0, "p0")), root, "bkt", 1)
      assert(v == 3, s"burned claim must be skipped, got v$v")
    } finally ScaleOps.deleteRecursively(root)
  }

  test("u21 query: the deterministic two-writer interleaving resolves buckets to their owners") {
    val out = OptimisticCommit.u21OccQuery(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 8, s"expected all 8 md5 buckets, got ${out.length}")
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)].collect()
    def bkt(k: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).take(4)
      (java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString, 16) % 8).toString
    }
    val want = orders.groupBy(o => bkt(o._1)).map { case (b, os) =>
      val bump = if (b == "0" || b == "1") 100.0 else if (b == "2" || b == "3") 200.0 else 0.0
      b -> BigDecimal(os.map(_._2 + bump).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }
    out.foreach { r =>
      val b = r.getAs[String]("bkt")
      assert(BigDecimal(r.getAs[Double]("sum_price")) == want(b),
        s"bucket $b: ${r.getAs[Double]("sum_price")} want ${want(b)}")
    }
  }
}
