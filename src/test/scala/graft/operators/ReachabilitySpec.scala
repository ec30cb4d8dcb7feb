package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReachabilitySpec extends SparkSpec {

  // path a→b→c→d→e plus a side branch b→x (symmetrized)
  private def pathEdges = {
    import spark.implicits._
    val one = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("b", "x"))
      .toDF("src", "dst")
    one.union(one.select($"dst".as("src"), $"src".as("dst")))
  }

  private def seed(names: String*) = {
    import spark.implicits._
    names.toDF("node")
  }

  test("bfs: hop = minimum distance, each node reported exactly once") {
    val out = Reachability.bfsLayers(pathEdges, seed("a"), hops = 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2, "x" -> 2, "d" -> 3))
    // e is 4 hops out — beyond the horizon
  }

  test("bfs: multi-seed layers take the min over seeds; frontier drains to empty early") {
    val out = Reachability.bfsLayers(pathEdges, seed("a", "c"), hops = 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    // c is a seed, so b/d are hop 1; everything lands by hop 2
    assert(out == Map("a" -> 0, "c" -> 0, "b" -> 1, "d" -> 1,
                      "e" -> 2, "x" -> 2))
  }

  test("bfs: partition-order independent (set equality under repartitioning)") {
    val a = Reachability.bfsLayers(pathEdges.repartition(1), seed("a"), 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val b = Reachability.bfsLayers(pathEdges.repartition(5), seed("a"), 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("bfs: >cutoff shuffle path (no broadcast hints) matches the broadcast path") {
    // cutoff 0 drops every broadcast hint, forcing the vertex-keyed
    // shuffle joins a billion-node frontier would take; the layer sets
    // must be identical to the hinted plan's
    val a = Reachability.bfsLayers(pathEdges, seed("a", "c"), hops = 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val b = Reachability.bfsLayers(pathEdges, seed("a", "c"), hops = 3,
        maxBroadcastNodes = 0)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("bfs: isolated seed (not in the edge list) still reports itself at hop 0") {
    val out = Reachability.bfsLayers(pathEdges, seed("zz"), 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out == Map("zz" -> 0))
  }
}
