package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlattCvSpec extends SparkSpec {
  import spark.implicits._

  test("platt scaling fits a monotone sigmoid separating the classes") {
    // well-separated decisions: y=+1 around f=+2, y=-1 around f=-2
    val rows = (0 until 200).map { i =>
      val y = if (i % 2 == 0) 1.0 else -1.0
      val f = y * 2.0 + (i % 7 - 3) * 0.1
      (f, y)
    }
    val df = rows.toDF("decision", "y")
    val m = Platt.fit(df, "decision", "y")
    assert(m.a < 0.0, s"A must be negative so P rises with f (got ${m.a})")
    val probs = df.select($"decision",
      Platt.probability($"decision", m).as("p")).collect()
    probs.foreach { r =>
      val (f, p) = (r.getDouble(0), r.getDouble(1))
      assert(p > 0.0 && p < 1.0)
      if (f > 1.0) assert(p > 0.9, s"f=$f p=$p")
      if (f < -1.0) assert(p < 0.1, s"f=$f p=$p")
    }
  }

  test("platt fit is deterministic for a fixed input") {
    val df = (0 until 100).map { i =>
      (math.sin(i) * 3.0, if (i % 3 == 0) 1.0 else -1.0)
    }.toDF("decision", "y")
    val m1 = Platt.fit(df, "decision", "y")
    val m2 = Platt.fit(df.repartition(7), "decision", "y")
    // content-identical input; partial-sum order shifts the Newton path
    // only below the convergence tolerance
    assert(math.abs(m1.a - m2.a) < 1e-4 && math.abs(m1.b - m2.b) < 1e-4)
  }

  test("feature scaling maps every dimension onto [0,1] with extremes attained") {
    val df = (0 until 100).map { i =>
      (i.toLong, Array(i * 0.5 + 3.0, -i * 2.0, 7.0)) // dim 2 constant
    }.toDF("id", "v")
    val stats = FeatureScale.fitStats(df, "v").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(stats(0) == (3.0, 52.5) && stats(1) == (-198.0, 0.0) && stats(2) == (7.0, 7.0))
    val mins = Array(stats(0)._1, stats(1)._1, stats(2)._1)
    val maxs = Array(stats(0)._2, stats(1)._2, stats(2)._2)
    val scaled = FeatureScale.applyScale(df, "v", "s", mins, maxs).select($"s")
      .collect().map(_.getSeq[Double](0))
    assert(scaled.forall(v => v.forall(x => x >= 0.0 && x <= 1.0)))
    assert(scaled.map(_(0)).min == 0.0 && scaled.map(_(0)).max == 1.0)
    assert(scaled.forall(_(2) == 0.0), "constant dim maps to lower bound")
  }

  test("cv grid query self-validates and produces a full grid") {
    val out = CrossVal.cvGridQuery(spark, "/root/testdata/sf0.001",
      folds = 2, grid = Seq(1e-3, 1e-1), numLandmarks = 16, maxIter = 5)
    val rows = out.collect()
    assert(rows.length == 4, "2 params x 2 folds")
    val best = rows.filter(_.getBoolean(6))
    assert(best.nonEmpty && best.map(_.getDouble(0)).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // train
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // val
    }
  }

  test("cv replay reproduces every fold accuracy from the saved artifacts") {
    // same dir as the grid test → shares the cached fit + saved files
    val grid = CrossVal.cvGridQuery(spark, "/root/testdata/sf0.001",
        folds = 2, grid = Seq(1e-3, 1e-1), numLandmarks = 16, maxIter = 5)
      .select($"reg_param", $"fold", $"n_train", $"n_val",
        $"train_accuracy", $"val_accuracy")
      .collect().map(r => (r.getDouble(0), r.getInt(1)) -> r).toMap
    val replay = CrossVal.cvReplayQuery(spark, "/root/testdata/sf0.001").collect()
    assert(replay.length == grid.size, "one replay row per grid cell")
    replay.foreach { r =>
      val g = grid((r.getDouble(0), r.getInt(1)))
      assert(r.getLong(2) == g.getLong(2) && r.getLong(3) == g.getLong(3),
        s"train/val sizes must replay exactly for cell ${(r.getDouble(0), r.getInt(1))}")
      // transform-based vs saved-weights margins agree except on exact
      // zero-margin knife edges; one flipped row at this panel size is
      // ~0.03, so a 0.05 band distinguishes replay from noise
      assert(math.abs(r.getDouble(4) - g.getDouble(4)) <= 0.05, "train accuracy replay")
      assert(math.abs(r.getDouble(5) - g.getDouble(5)) <= 0.05, "val accuracy replay")
    }
  }
}
