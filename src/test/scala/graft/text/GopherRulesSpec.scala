package graft.text

import graft.SparkSpec

class GopherRulesSpec extends SparkSpec {

  test("gopher rules: signals are exact integer millionths; keep = AND of all rules") {
    val rows = GopherRules.query(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val keep = r.getBoolean(11)
      val ands = (6 to 10).map(r.getBoolean).forall(identity)
      assert(keep == ands)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L) // alpha frac in [0,1]
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L) // dup-line frac in [0,1]
    }
    // the corpus must exercise BOTH branches or the filter is untested
    assert(rows.exists(_.getBoolean(11)) , "no doc kept")
    assert(rows.exists(!_.getBoolean(11)), "no doc dropped")
  }

  test("gopher rules: row-local plan — no join, no aggregate (ingest-rate shape)") {
    val core = GopherRules.query(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    assert(!core.contains("Join"), s"unexpected join in gopher rules plan:\n$core")
    assert(!core.contains("Aggregate"), s"unexpected aggregate:\n$core")
  }
}
