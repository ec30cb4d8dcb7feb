package graft.dedup

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {

  test("semdedup: within-cell near-identical pair dedups to the lowest id; cross-cell twins are out of scope by definition") {
    import spark.implicits._
    // two well-separated clusters; hand-made centroids pin assignment
    val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val rows = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)),   // cell 0
      (2L, Array(1.0f, 0.012f, 0.0f)),  // cell 0, near-identical to 1 → dup_of 1
      (3L, Array(0.99f, 0.013f, 0.0f)), // cell 0, near-identical too → dup_of 1 (min counterpart)
      (4L, Array(0.0f, 1.0f, 0.02f)),   // cell 1, alone there → kept even though
                                        // it is NOT similar to anything
      (5L, Array(0.6f, 0.8f, 0.0f))     // cell 1 (closer to centroid 1), cos vs 4 ≈ 0.8 → dup
    ).toDF("vec_id", "embedding")
    val out = SemDedup.decisions(rows, "vec_id", "embedding", centroids, 0.9)
      .orderBy($"vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.get(2)), r.getBoolean(3)))
    assert(out(0) == ((1L, 0, None, true)))
    assert(out(1) == ((2L, 0, Some(1L), false)))
    assert(out(2) == ((3L, 0, Some(1L), false)))
    assert(out(3) == ((4L, 1, None, true)))
    // 5 vs 4: cos = 0.8/ (1*1) ≈ 0.798 < 0.9 → kept; the pair (1,5) at
    // cos ≈ 0.6 is cross-cell anyway
    assert(out(4)._4 === true)
  }

  test("semdedup: nlist grows linearly with corpus size (bounded within-cell quadratic work)") {
    assert(SemDedup.nlistFor(500) == 8)        // floor at small corpora
    assert(SemDedup.nlistFor(512 * 100) == 100) // n/targetCell beyond it
    assert(SemDedup.nlistFor(512L * 100000) == 100000)
  }

  test("semdedup: threshold is inclusive and the representative chain is single-hop (dup_of is always a kept or lower id)") {
    import spark.implicits._
    val centroids = Array(Array(1.0, 0.0))
    val rows = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(1.0f, 0.0f)),  // identical → cos 1.0 ≥ τ=1.0 (inclusive)
      (12L, Array(0.0f, 1.0f))   // orthogonal, same cell → kept at τ=1.0
    ).toDF("vec_id", "embedding")
    val out = SemDedup.decisions(rows, "vec_id", "embedding", centroids, 1.0)
      .orderBy($"vec_id").collect()
    assert(out(0).getBoolean(3) && !out(1).getBoolean(3) && out(2).getBoolean(3))
    assert(out(1).getLong(2) == 10L)
  }

  test("semdedup: broadcast-matrix assignment is bit-identical to the fused-expression cellOf") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(99)
    val k = 23; val dim = 16
    val centroids = Array.fill(k)(Array.fill(dim)(rng.nextGaussian()))
    val rows = (0 until 500).map { i =>
      // include exact centroid copies (distance-0 rows) and midpoints
      // (tie-prone) alongside random vectors
      val v = i % 7 match {
        case 0 => centroids(i % k).clone()
        case 1 => centroids(i % k).zip(centroids((i + 1) % k)).map(t => (t._1 + t._2) / 2.0)
        case _ => Array.fill(dim)(rng.nextGaussian())
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val viaLoop = SemDedup.assignCells(rows, "vec_id", "embedding", centroids)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    val viaExpr = rows
      .select($"vec_id",
        graft.sim.IvfAnn.cellOf(
          graft.functions.VectorOps.toDoubleArray($"embedding"), centroids).as("cluster"))
      .as[(Long, Int)].collect().toMap
    assert(viaLoop.size == 500 && viaLoop == viaExpr)
  }
}
