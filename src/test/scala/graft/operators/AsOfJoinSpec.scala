package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AsOfJoin.asOf: the union-tag + running-last shape must agree with
  * the naive per-left-row "max right.ts <= t" reference under every
  * option (inclusive/strict, tolerance, outer nulls), and must plan
  * with no join operator at all.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = spark.range(200).select(
    (col("id") % 4).as("k"), col("id").as("lid"),
    pmod(hash(col("id")), lit(1000)).cast("long").as("lt"))
  private lazy val right = spark.range(150).select(
    (col("id") % 4).as("k"), col("id").as("rid"),
    pmod(hash(col("id"), lit(3)), lit(1000)).cast("long").as("rt"))

  /** Naive reference: left-outer join then keep the max-rt (tie: max
    * payload, mirroring the operator's struct tie-break) right row per
    * left row. */
  private def naive(strict: Boolean, tol: Option[Long]): Set[(Long, Long, Option[Long])] = {
    val cond = if (strict) col("rt") < col("lt") else col("rt") <= col("lt")
    val within = tol.map(t => col("rt") >= col("lt") - t).getOrElse(lit(true))
    left.join(right, Seq("k"), "left")
      .withColumn("ok", cond && within)
      .groupBy("k", "lid", "lt")
      .agg(max(when(col("ok"), struct(col("rt"), col("rid")))).as("m"))
      .select(col("k"), col("lid"), col("m.rid").as("rid"))
      .as[(Long, Long, Option[Long])].collect().toSet
  }

  private def run(strict: Boolean, tol: Option[Long]) =
    AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", strict, tol)
      .select(col("k"), col("lid"), col("rid"))
      .as[(Long, Long, Option[Long])].collect()

  test("inclusive as-of == naive argmax reference (outer nulls kept)") {
    val got = run(strict = false, tol = None)
    assert(got.length == 200, "left-outer must keep every left row")
    assert(got.toSet == naive(strict = false, tol = None))
  }

  test("strict as-of excludes equal timestamps") {
    // plant an exact tie: rt == lt for a known pair
    val l = Seq((9L, 1L, 500L)).toDF("k", "lid", "lt")
    val r = Seq((9L, 10L, 500L), (9L, 11L, 400L)).toDF("k", "rid", "rt")
    val inc = AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt")
      .select("rid").as[Option[Long]].head()
    val str = AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt", strict = true)
      .select("rid").as[Option[Long]].head()
    assert(inc.contains(10L), s"inclusive must match the equal-ts row: $inc")
    assert(str.contains(11L), s"strict must skip the equal-ts row: $str")
    assert(run(strict = true, tol = None).toSet == naive(strict = true, tol = None))
  }

  test("tolerance nulls out stale matches but keeps the row") {
    val tol = Some(80L)
    val got = run(strict = false, tol = tol)
    assert(got.length == 200)
    assert(got.toSet == naive(strict = false, tol = tol))
    // the tolerance must actually bite on this fixture
    val nulls = got.count(_._3.isEmpty)
    val noTolNulls = run(strict = false, tol = None).count(_._3.isEmpty)
    assert(nulls > noTolNulls, "fixture never exercised the tolerance cut")
  }

  test("equal-ts right ties resolve deterministically to the max payload") {
    val l = Seq((1L, 1L, 100L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 7L, 90L), (1L, 3L, 90L), (1L, 5L, 90L))
      .toDF("k", "rid", "rt")
    val picks = (1 to 5).map(_ => AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt")
      .select("rid").as[Long].head()).toSet
    assert(picks == Set(7L), s"tie must always pick max payload: $picks")
  }

  test("plan contains no join operator — one shuffle and a window") {
    val df = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt")
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join"), "as-of must not plan a join operator")
    assert(plan.contains("Window"), "running-last window missing")
    // the formatted output echoes the pre-AQE skeleton under
    // "== Initial Plan ==" — audit only the final operator tree
    val finalSection = plan.split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(finalSection).size == 1,
      "as-of must shuffle exactly once (on the keys)")
  }
}
