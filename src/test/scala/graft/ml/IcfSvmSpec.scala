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

  test("psvm-style text model roundtrips exactly") {
    val rng = new scala.util.Random(41)
    val pts = (0 until 60).map { i =>
      val pos = i % 2 == 0
      val cx = if (pos) 1.5 else -1.5
      (i.toLong,
       Array(cx + rng.nextGaussian() * 0.5, -cx + rng.nextGaussian() * 0.5),
       if (pos) 1.0 else -1.0)
    }
    val df = pts.toDF("id", "vec", "y")
    val model = IcfSvmTrainer.fit(df, "id", "vec", "y",
      Kernel.Rbf(0.5), rank = 16, c = 1.0, maxIter = 40)
    val dir = java.nio.file.Files.createTempDirectory("icfsvm_text").toString
    model.saveText(spark, dir)
    val loaded = IcfSvmModel.loadText(spark, dir)
    assert(loaded.numSupportVectors === model.numSupportVectors)
    assert(loaded.bias === model.bias, "rho/bias roundtrips via Double.toString")
    assert(loaded.kernel === model.kernel)
    val orig = model.predict(df, "id", "vec")
      .select("id", "decision").as[(Long, Double)].collect().toMap
    val back = loaded.predict(df, "id", "vec")
      .select("id", "decision").as[(Long, Double)].collect().toMap
    pts.foreach { case (id, _, _) =>
      assert(math.abs(orig(id) - back(id)) < 1e-12,
        s"decision for $id drifted: ${orig(id)} vs ${back(id)}")
    }
  }

  test("per-class C weights shift the confusion matrix toward the rare class") {
    // 10:1 imbalanced overlapping blobs: unweighted C under-recalls the
    // rare positive class; boosting posWeight must raise tp (recall).
    val rng = new scala.util.Random(13)
    val pts = (0 until 220).map { i =>
      val pos = i % 11 == 0                       // ~9% positive
      val cx = if (pos) 0.8 else -0.8             // heavy overlap
      (i.toLong,
       Array(cx + rng.nextGaussian(), cx + rng.nextGaussian()),
       if (pos) 1.0 else -1.0)
    }
    val df = pts.toDF("id", "vec", "y").persist()
    def tpOf(posWeight: Double): Long = {
      val m = IcfSvmTrainer.fit(df, "id", "vec", "y",
        Kernel.Rbf(0.5), rank = 16, c = 1.0, maxIter = 40,
        posWeight = posWeight)
      SvmEvaluator.evaluate(m.predict(df, "id", "vec"), "y")
        .head.getAs[Long]("tp")
    }
    val tpPlain = tpOf(1.0)
    val tpWeighted = tpOf(10.0)
    info(s"tp unweighted=$tpPlain, tp with posWeight=10: $tpWeighted")
    assert(tpWeighted > tpPlain,
      "upweighting the rare class must recover more of its points")
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
