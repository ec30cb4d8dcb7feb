package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SsspSpec extends SparkSpec {

  // weighted diamond: a→b (1), a→c (5), b→c (1), c→d (1), b→d (9),
  // plus an expensive shortcut a→d (10) — the shortest a→d is the
  // 3-edge path a→b→c→d (3), NOT the 1-edge direct one, so bounded
  // rounds and min-plus relaxation both get exercised. Symmetrized.
  private def diamond = {
    import spark.implicits._
    val one = Seq(("a", "b", 1L), ("a", "c", 5L), ("b", "c", 1L),
                  ("c", "d", 1L), ("b", "d", 9L), ("a", "d", 10L))
      .toDF("src", "dst", "w")
    one.union(one.select($"dst".as("src"), $"src".as("dst"), $"w"))
  }

  private def seed(names: String*) = {
    import spark.implicits._
    names.toDF("node")
  }

  private def run(edges: org.apache.spark.sql.DataFrame,
                  seeds: org.apache.spark.sql.DataFrame,
                  rounds: Int = Sssp.MaxRounds,
                  cutoff: Long = GraphBroadcast.MaxBroadcastNodes) =
    Sssp.shortestPaths(edges, seeds, rounds, cutoff)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("sssp: multi-edge path beats the direct edge (true weighted distances)") {
    assert(run(diamond, seed("a")) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("sssp: bounded rounds give the exact <=r-edge distance") {
    // 1 round: only direct edges relax
    assert(run(diamond, seed("a"), rounds = 1) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 5L, "d" -> 10L))
    // 2 rounds: a→b→c and a→b→d / a→c→d improve
    assert(run(diamond, seed("a"), rounds = 2) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 6L))
  }

  test("sssp: multi-seed takes the min over seeds; isolated seed reports dist 0") {
    val out = run(diamond, seed("d", "zz"))
    assert(out("zz") == 0L && out("d") == 0L && out("c") == 1L &&
      out("b") == 2L && out("a") == 3L)
  }

  test("sssp: >cutoff shuffle path is bit-identical to the broadcast path") {
    val a = run(diamond, seed("a"))
    val b = run(diamond, seed("a"), cutoff = 0L)
    assert(a == b)
  }

  test("sssp: partition-order independent") {
    val a = run(diamond.repartition(1), seed("a"))
    val b = run(diamond.repartition(7), seed("a"))
    assert(a == b)
  }

  test("sssp: early exit when the frontier drains equals the full unroll") {
    // diamond settles by round 3; rounds=8 must return the same map
    assert(run(diamond, seed("a"), rounds = 3) == run(diamond, seed("a"), rounds = 8))
  }
}
