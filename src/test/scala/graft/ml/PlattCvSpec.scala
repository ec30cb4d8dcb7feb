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
}
