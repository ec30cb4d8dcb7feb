package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml._

/** Dev-only: phase-level timing of m6 (ICF → IPM → SV model → text
  * round-trip → ordered scoring) — the decade suite's heaviest row.
  * Usage: M6Probe <sfDir>
  */
object M6Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val realOnly = sys.env.contains("M6PROBE_REAL")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[m6probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    if (realOnly) {
      val rows = t("real_m6_query") {
        graft.ml.MlQueries.svmIcfIpmEval(spark, dir).collect()
      }
      rows.foreach(r => println(s"[m6probe] m6 row: $r"))
      spark.stop(); return
    }
    val data = graft.Tables.embeddings(spark, dir)
      .withColumn("yy", when($"label" % 2 === 0, 1.0).otherwise(-1.0))
    println(s"[m6probe] n = ${data.count()}")

    val h = t("icf_factorize") {
      val x = Icf.factorize(data, "vec_id", "embedding", Kernel.Rbf(0.05), 16)
      x.count(); x
    }
    val nRows = data.count()
    val parts = math.max(1, math.min(data.rdd.getNumPartitions, (nRows / 50000L).toInt + 1))
    val joined = t("join+persist") {
      val j = data.select($"vec_id".cast("long").as("__id"),
          graft.functions.VectorOps.toDoubleArray($"embedding").as("__x"),
          $"yy".cast("double").as("__y"))
        .join(h.withColumnRenamed("id", "__id"), Seq("__id"))
        .coalesce(parts).persist()
      j.count(); j
    }
    val alphas = t("ipm_solve") {
      Ipm.solve(joined, "__id", "__y", "icf_features", 5.0,
        maxIter = 40, tol = 1e-3)._1
    }
    val alphaDf = spark.createDataFrame(alphas).toDF("__id", "__alpha")
    val svDf = t("sv_select") {
      val s = joined.join(alphaDf, Seq("__id"))
        .filter($"__alpha" > lit(1e-4) * lit(5.0))
        .select($"__id".as("sv_id"), $"__x".as("sv_x"),
          ($"__y" * $"__alpha").as("sv_coef"),
          $"__alpha".as("sv_alpha"), $"__y".as("sv_y"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[m6probe] nSV = ${s.count()}")
      s
    }
    val nFree = svDf.filter($"sv_alpha" < lit(5.0) * (1 - 1e-3)).count()
    println(s"[m6probe] nFree = $nFree")
    val model = IcfSvmModel(Kernel.Rbf(0.05), svDf, svDf.count(), 0.0)
    def biasWith(cap: Int): Double = {
      val free = svDf.filter($"sv_alpha" < lit(5.0) * (1 - 1e-3))
        .select($"sv_id".as("__fid"), $"sv_x".as("__fx"), $"sv_y".as("__fy"))
        .orderBy(xxhash64($"__fid"), $"__fid").limit(cap)
      svDf.select($"sv_x", $"sv_coef")
        .crossJoin(broadcast(free))
        .groupBy($"__fid", $"__fy")
        .agg(sum($"sv_coef" * Kernel.Rbf(0.05)($"sv_x", $"__fx")).as("__s"))
        .agg(avg($"__fy" - $"__s").as("b")).head().getDouble(0)
    }
    val bFac = t("bias_factored") {
      val withA = joined.join(alphaDf, Seq("__id"))
      val p = 16
      val v = withA.select($"__alpha", $"__y", $"icf_features")
        .rdd.treeAggregate(new Array[Double](p))(
          seqOp = { (acc, r) =>
            val a = r.getDouble(0) * r.getDouble(1)
            val hi = r.getSeq[Double](2)
            var j = 0; while (j < p) { acc(j) += a * hi(j); j += 1 }
            acc
          },
          combOp = { (x, y) => var j = 0; while (j < p) { x(j) += y(j); j += 1 }; x })
      val agg = withA
        .filter($"__alpha" > lit(1e-4) * 5.0 && $"__alpha" < lit(5.0) * (1 - 1e-3))
        .select($"__y", $"icf_features")
        .rdd.map { r =>
          val hi = r.getSeq[Double](1)
          var s = 0.0; var j = 0; while (j < p) { s += v(j) * hi(j); j += 1 }
          (r.getDouble(0) - s, 1L)
        }.fold((0.0, 0L)) { (a, b) => (a._1 + b._1, a._2 + b._2) }
      agg._1 / agg._2
    }
    println(f"[m6probe] bias factored = $bFac%.8f")
    val bCap = t("bias_capped_8192") { biasWith(8192) }
    if (sys.env.contains("M6PROBE_FULL_BIAS")) {
      val bAll = t("bias_all_free") { biasWith(Int.MaxValue) }
      println(f"[m6probe] bias capped = $bCap%.8f, all-free = $bAll%.8f, diff = ${math.abs(bCap - bAll)}%.2e")
    }
    t("saveText") { model.saveText(spark, "/tmp/m6probe_model") }
    val loaded = t("loadText") {
      val m = IcfSvmModel.loadText(spark, "/tmp/m6probe_model")
      m.svs.count(); m
    }
    t("predict(plain)+count") {
      loaded.predict(data, "vec_id", "embedding").agg(sum("decision")).head()
    }
    spark.stop()
  }
}
