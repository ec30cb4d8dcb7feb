package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RangeJoin: the binned equi-join decomposition must return EXACTLY the
  * pairs of the naive inequality join, for every relationship between
  * bin width and interval length, including the boundary cases that a
  * wrong bin formula gets wrong (point == start, point == end, interval
  * ends exactly on a bin edge, interval shorter/longer than the bin).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: 3 keys, points and intervals
  // scattered over [0, 10000) with interval lengths 0..~900 (zero-length
  // and inverted intervals included on purpose — they must match nothing)
  private lazy val points = spark.range(300).select(
    (col("id") % 3).as("k"),
    col("id").as("pid"),
    pmod(hash(col("id")), lit(10000)).cast("long").as("t"))
  private lazy val intervals = spark.range(120).select(
    (col("id") % 3).as("k"),
    col("id").as("iid"),
    pmod(hash(col("id"), lit(7)), lit(10000)).cast("long").as("s"))
    .withColumn("e", col("s") + pmod(hash(col("iid"), lit(13)), lit(900)) - lit(50))

  private def naive() = points.join(intervals, Seq("k"))
    .filter(col("t") >= col("s") && col("t") < col("e"))
    .select("k", "pid", "iid").as[(Long, Long, Long)]
    .collect().toSet

  test("binned join == naive inequality join across bin widths") {
    val want = naive()
    assert(want.nonEmpty, "fixture produced no pairs — broaden it")
    for (w <- Seq(64L, 300L, 1000L, 100000L)) {
      val got = RangeJoin.pointsInIntervals(points, intervals,
          Seq("k"), "t", "s", "e", w)
        .select("k", "pid", "iid").as[(Long, Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"w=$w: duplicate pairs emitted — bin explosion double-counted")
      assert(got.toSet == want, s"w=$w: pair set differs from naive join")
    }
  }

  test("exact boundary semantics: [start, end) half-open, bin edges") {
    // points sitting exactly on start, end-1, end, and a bin edge
    val pts = Seq((1L, 1L, 100L), (1L, 2L, 199L), (1L, 3L, 200L),
                  (1L, 4L, 64L), (1L, 5L, 128L)).toDF("k", "pid", "t")
    val ivs = Seq((1L, 10L, 100L, 200L), (1L, 11L, 64L, 128L))
      .toDF("k", "iid", "s", "e")
    val got = RangeJoin.pointsInIntervals(pts, ivs, Seq("k"), "t", "s", "e", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (5L, 10L), (1L, 11L), (4L, 11L)),
      s"boundary pairs wrong: $got")
  }

  test("overlap join == naive double-inequality join across bin widths") {
    // reuse the fixture's intervals on both sides (relabeled), so the
    // overlap set includes identical, nested, disjoint and edge-touching
    // interval pairs
    val left = intervals.toDF("k", "lid", "ls", "le")
    val right = intervals.toDF("k", "rid", "rs", "re")
      .withColumn("rs", col("rs") + 17).withColumn("re", col("re") + 17)
    // inverted/empty intervals must match nothing: the bare overlap
    // inequality alone would "overlap" them, so the naive reference
    // carries the same non-empty guard the operator applies
    val want = left.join(right, Seq("k"))
      .filter(col("ls") < col("le") && col("rs") < col("re") &&
              col("ls") < col("re") && col("rs") < col("le"))
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "overlap fixture produced no pairs — broaden it")
    for (w <- Seq(64L, 300L, 1000L, 100000L)) {
      val got = RangeJoin.intervalOverlapJoin(left, right, Seq("k"),
          "ls", "le", "rs", "re", w)
        .select("k", "lid", "rid").as[(Long, Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"w=$w: duplicate overlap pairs — bin-of-overlap-start dedup broke")
      assert(got.toSet == want, s"w=$w: overlap pair set differs from naive")
    }
  }

  test("q40 plans as a shuffled equi-join — no nested loop, no cartesian") {
    val df = graft.SparkEntry.queries("q40_range_join")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      "q40: interval join fell back to a nested-loop plan")
    assert(plan.contains("[codegen id :"), "q40: no codegen span")
  }
}
