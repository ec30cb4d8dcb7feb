package graft.ml

import graft.SparkSpec

class IcfSvmSpec extends SparkSpec {
  import spark.implicits._

  test("full psvm pipeline (ICF -> IPM -> SV model) separates blobs") {
    val rng = new scala.util.Random(23)
    val pts = (0 until 80).map { i =>
      val pos = i % 2 == 0
      val cx = if (pos) 2.0 else -2.0
      (i.toLong,
       Array(cx + rng.nextGaussian() * 0.4, -cx + rng.nextGaussian() * 0.4),
       if (pos) 1.0 else -1.0)
    }
    val df = pts.toDF("id", "vec", "y")
    val model = IcfSvmTrainer.fit(df, "id", "vec", "y",
      Kernel.Rbf(0.5), rank = 20, c = 1.0, maxIter = 60)
    info(s"support vectors: ${model.numSupportVectors} of ${pts.size}")
    assert(model.numSupportVectors > 0 && model.numSupportVectors <= pts.size)

    val scored = model.predict(df, "id", "vec")
    val acc = SvmEvaluator.evaluate(scored, "y").head.getAs[Double]("accuracy")
    assert(acc === 1.0, s"separable data must classify perfectly, got $acc")
  }

  test("non-separable data: SV set stays distributed (O(n) SVs, no driver copy)") {
    // random labels -> nothing is separable -> nearly every point is a
    // support vector; the model must hold them as a DataFrame and still
    // score correctly through the kernel-sum join
    val rng = new scala.util.Random(7)
    val pts = (0 until 200).map { i =>
      (i.toLong,
       Array(rng.nextGaussian(), rng.nextGaussian()),
       if (rng.nextBoolean()) 1.0 else -1.0)
    }
    val df = pts.toDF("id", "vec", "y")
    val model = IcfSvmTrainer.fit(df, "id", "vec", "y",
      Kernel.Rbf(0.5), rank = 12, c = 1.0, maxIter = 40, tol = 1e-4)
    info(s"support vectors: ${model.numSupportVectors} of ${pts.size}")
    assert(model.numSupportVectors > pts.size / 2,
      "non-separable data should make most points support vectors")
    // the SV set is a (distributed) DataFrame, not a driver-side array
    assert(model.svs.columns.contains("sv_x") && model.svs.columns.contains("sv_coef"))
    val scored = model.predict(df, "id", "vec")
    assert(scored.count() === pts.size.toLong)
    val acc = SvmEvaluator.evaluate(scored, "y").head.getAs[Double]("accuracy")
    assert(acc > 0.5, s"in-sample accuracy should beat chance, got $acc")
  }
}
