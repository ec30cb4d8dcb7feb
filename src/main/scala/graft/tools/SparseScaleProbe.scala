package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the sparse-vs-dense A/B the m14/m15 design claims — at the
  * fixture's 32768 dims with ~40–80 non-zeros, the dense kernels pay
  * O(dim) per pair and dim doubles per row; the merge-join kernels pay
  * O(nnz). Measures (a) a pair-panel kernel matrix through both paths,
  * (b) the Nyström feature map over the corpus through both paths, and
  * (c) the bytes-per-row gap (what the shuffle/scan would carry).
  */
object SparseScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ml._

    val dim = SparseMlQueries.Dim
    val sp = SparseMlQueries.sparseDocVectors(spark, dir).persist()
    val nDocs = sp.count()
    val nnzStats = sp.agg(avg(size($"indices")), max(size($"indices"))).head()
    System.err.println(f"[sparse] docs=$nDocs dim=$dim avg_nnz=${nnzStats.getDouble(0)}%.1f " +
      f"max_nnz=${nnzStats.getInt(1)} bytes/row sparse~${nnzStats.getDouble(0) * 12}%.0f " +
      f"dense=${dim * 8}")

    // densified twin (the path a dense-only engine would be forced into)
    val dn = sp.select($"doc_id",
      graft.functions.SparseOps.toDense($"indices", $"values", dim).as("vec")).persist()
    dn.count()

    // (a) pair-panel kernel matrix: 100 × nDocs RBF kernel values
    val qs = sp.filter($"doc_id" < 100)
      .select($"doc_id".as("qid"), $"indices".as("qi"), $"values".as("qv"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[sparse] $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    time(s"kernel-matrix sparse (${100 * nDocs} pairs)") {
      qs.crossJoin(sp)
        .select(sum(Kernel.Rbf(0.01).sparse($"qi", $"qv", $"indices", $"values")))
        .head()
    }
    val qd = dn.filter($"doc_id" < 100)
      .select($"doc_id".as("qid"), $"vec".as("qvec"))
    time(s"kernel-matrix dense  (${100 * nDocs} pairs)") {
      qd.crossJoin(dn)
        .select(sum(Kernel.Rbf(0.01)($"qvec", $"vec")))
        .head()
    }

    // (b) Nyström feature map over the whole corpus, 32 landmarks
    val smap = SparseNystrom.fit(sp, "doc_id", "indices", "values", Kernel.Rbf(0.01), 32)
    time("nystrom transform sparse") {
      SparseNystrom.transform(sp, "indices", "values", smap, "phi")
        .select(sum(element_at($"phi", 1))).head()
    }
    val dmap = Nystrom.fit(dn, "doc_id", "vec", Kernel.Rbf(0.01), 32)
    time("nystrom transform dense ") {
      Nystrom.transform(dn, "vec", dmap, "phi")
        .select(sum(element_at($"phi", 1))).head()
    }
    spark.stop()
  }
}
