package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int = 320, dim: Int = 16) = {
    val rng = new scala.util.Random(29)
    val centers = Array.fill(8)(Array.fill(dim)(rng.nextGaussian() * 5.0))
    (0 until n).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def recallVsExact(g: org.apache.spark.sql.DataFrame,
                            df: org.apache.spark.sql.DataFrame, k: Int): Double = {
    val exact = Knn.bruteForce(df, df, "vec_id", "embedding", k)
      .select($"query_id".as("src"), $"neighbor_id".as("nbr"))
    val hits = g.select($"src", $"nbr").join(exact, Seq("src", "nbr"), "leftsemi").count()
    hits.toDouble / g.count()
  }

  test("p67: NN-descent recall vs the exact p6 graph is high on clustered data and improves per round") {
    val df = clustered()
    val r0 = recallVsExact(NnDescent.knnGraph(df, "vec_id", "embedding", rounds = 0), df, 10)
    val r1 = recallVsExact(NnDescent.knnGraph(df, "vec_id", "embedding", rounds = 1), df, 10)
    val r2 = recallVsExact(NnDescent.knnGraph(df, "vec_id", "embedding", rounds = 2), df, 10)
    assert(r1 >= r0 && r2 >= r1, s"recall must not regress per round: $r0 -> $r1 -> $r2")
    assert(r2 >= 0.9, s"clustered-fixture recall@10 after 2 rounds: $r2")
    assert(r2 > r0 + 0.2, s"descent must actually improve over init: $r0 -> $r2")
  }

  test("p67: graph invariants — k ranked neighbors per node, no self edges, descending cosine") {
    val df = clustered(n = 120)
    val g = NnDescent.knnGraph(df, "vec_id", "embedding").collect()
    val byNode = g.groupBy(_.getAs[Long]("src"))
    assert(byNode.size == 120)
    for ((v, rows) <- byNode) {
      assert(rows.length == 10 && rows.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 10L))
      assert(!rows.exists(_.getAs[Long]("nbr") == v), s"self edge at $v")
      val cs = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("p67 query: deterministic across runs, recall gate passes on sf0.001") {
    val a = NnDescent.query(spark, "/root/testdata/sf0.001").collect()
    val b = NnDescent.query(spark, "/root/testdata/sf0.001").collect()
    assert(a.length == b.length && a.sameElements(b), "trajectory must be deterministic")
    assert(a.length == 500 * 10, s"one top-10 per node, got ${a.length}")
  }
}
