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

    val scored = model.predict(df, "vec")
    val acc = SvmEvaluator.evaluate(scored, "y").head.getAs[Double]("accuracy")
    assert(acc === 1.0, s"separable data must classify perfectly, got $acc")
  }
}
