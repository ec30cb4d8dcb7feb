package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  // star: hub h connected to spokes a,b,c (symmetrized)
  private def starEdges = {
    import spark.implicits._
    val one = Seq(("h", "a"), ("h", "b"), ("h", "c")).toDF("src", "dst")
    one.union(one.select($"dst".as("src"), $"src".as("dst")))
  }

  test("pagerank: hub outranks spokes, symmetric spokes tie exactly") {
    val out = PageRank.ranks(starEdges).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out("h") > out("a"))
    assert(out("a") == out("b") && out("b") == out("c"))
  }

  test("pagerank: total mass stays ~1 (quantization loses < 1e-9 per edge)") {
    val total = PageRank.ranks(starEdges).collect().map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("pagerank: floor-quantized contributions make the result bit-identical under any partitioning") {
    import spark.implicits._
    // ring of 64 nodes with a chord fan to node 0 — nontrivial structure
    val base = (0 until 64).map(i => (s"n$i", s"n${(i + 1) % 64}")) ++
      (1 until 16).map(i => (s"n${i * 4}", "n0"))
    val df = base.toDF("src", "dst")
    val sym = df.union(df.select($"dst".as("src"), $"src".as("dst")))
    val a = PageRank.ranks(sym.repartition(1)).orderBy("node").collect()
    val b = PageRank.ranks(sym.repartition(7)).orderBy("node").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getDouble(1) == y.getDouble(1)) // bit equality, not tolerance
    }
  }

  test("pagerank: >cutoff shuffle path is bit-identical to the broadcast path") {
    import spark.implicits._
    // pin the cutoff to 0 so the same small graph exercises the branch
    // that would run on a billion-node graph (co-partitioned edges,
    // shuffled vertex-sized messages) — the quantized integer sums make
    // the two physical plans produce identical bits
    val base = (0 until 40).map(i => (s"n$i", s"n${(i + 3) % 40}")) ++
      (1 until 10).map(i => (s"n${i * 3}", "n1"))
    val df = base.toDF("src", "dst")
    val sym = df.union(df.select($"dst".as("src"), $"src".as("dst")))
    val bcast = PageRank.ranks(sym).orderBy("node").collect()
    val shuf  = PageRank.ranks(sym, maxBroadcastNodes = 0).orderBy("node").collect()
    assert(bcast.length == shuf.length && bcast.nonEmpty)
    bcast.zip(shuf).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getDouble(1) == y.getDouble(1))
    }
  }

  test("pagerank: heap-derived default cutoff is within its documented bounds") {
    val c = GraphBroadcast.MaxBroadcastNodes
    assert(c >= 1000000L && c <= 10000000L)
  }

  test("graph broadcast: memory strings parse; malformed override fails with a clear message") {
    assert(GraphBroadcast.parseMemoryBytes("4g") == 4L << 30)
    assert(GraphBroadcast.parseMemoryBytes("512m") == 512L << 20)
    assert(GraphBroadcast.parseMemoryBytes("1024") == 1024L)
    assert(GraphBroadcast.parseMemoryBytes("2.5g") == (2.5 * (1L << 30)).toLong)
    // unparseable → MaxValue so the driver-heap term governs alone
    assert(GraphBroadcast.parseMemoryBytes("oops") == Long.MaxValue)
    val prev = sys.props.get("graft.graph.broadcastMaxNodes")
    try {
      sys.props("graft.graph.broadcastMaxNodes") = "not-a-number"
      val e = intercept[IllegalArgumentException](GraphBroadcast.MaxBroadcastNodes)
      assert(e.getMessage.contains("broadcastMaxNodes"))
    } finally prev match {
      case Some(v) => sys.props("graft.graph.broadcastMaxNodes") = v
      case None => sys.props -= "graft.graph.broadcastMaxNodes"
    }
  }
}
