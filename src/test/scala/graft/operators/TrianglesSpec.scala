package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Triangles.triangleCounts(edges.toDF("a", "b"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("n_triangles"),
         r.getAs[Long]("cc_micro")))
      .toMap

  test("K4 has 4 triangles, 3 per node, cc = 1") {
    val out = counts(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(out.values.map(_._2).sum === 12L, "4 triangles x 3 nodes")
    out.foreach { case (id, (deg, tri, cc)) =>
      assert(deg === 3L && tri === 3L && cc === 1000000L, s"node $id: $deg $tri $cc")
    }
  }

  test("one triangle plus a pendant: pendant has degree 1, zero triangles") {
    val out = counts(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(out(1L) === ((2L, 1L, 1000000L)))
    assert(out(2L) === ((2L, 1L, 1000000L)))
    assert(out(3L) === ((3L, 1L, 333333L)), "cc = 2*1/(3*2) floored to micro")
    assert(out(4L) === ((1L, 0L, 0L)))
  }

  test("star graph: hub generates no wedges under degree orientation") {
    val out = counts(Seq((10L, 1L).swap, (2L, 10L), (3L, 10L), (4L, 10L)))
    assert(out(10L) === ((4L, 0L, 0L)))
    assert(out(1L)._2 === 0L)
  }

  test("two disjoint triangles count independently") {
    val out = counts(Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L), (7L, 9L), (8L, 9L)))
    assert(out.values.map(_._2).sum === 6L)
    assert(out(7L)._2 === 1L && out(1L)._2 === 1L)
  }

  test("plan shape: all joins equi-keyed, no cartesian products") {
    val plan = Triangles.triangleCounts(
        Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
