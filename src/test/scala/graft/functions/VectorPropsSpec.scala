package graft.functions

import graft.SparkSpec

/** Property-style invariants for the similarity/dedup math (driver-side
  * twins of the column functions — same formulas), sampled over seeded
  * random inputs. */
class VectorPropsSpec extends SparkSpec {

  private val rng = new scala.util.Random(31)
  private def vec(): Array[Double] = Array.fill(16)(rng.nextDouble() * 10 - 5)
  private def lset(): Set[Long] = Set.fill(1 + rng.nextInt(20))(rng.nextInt(50).toLong)

  private def cosLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine similarity is bounded, symmetric, and 1 on self (200 samples)") {
    for (_ <- 1 to 200) {
      val a = vec(); val b = vec()
      val c = cosLocal(a, b)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(math.abs(c - cosLocal(b, a)) < 1e-12)
      assert(math.abs(cosLocal(a, a) - 1.0) < 1e-9)
    }
  }

  private def jaccard(a: Set[Long], b: Set[Long]): Double = {
    val inter = a.intersect(b).size.toDouble
    inter / (a.size + b.size - inter)
  }

  test("jaccard is bounded, symmetric, 1 on self, 0 on disjoint (200 samples)") {
    for (_ <- 1 to 200) {
      val a = lset(); val b = lset()
      val j = jaccard(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(jaccard(a, b) === jaccard(b, a))
      assert(jaccard(a, a) === 1.0)
      assert(jaccard(a, b.map(_ + 100)) === 0.0)
    }
  }

  test("kernels are symmetric with unit diagonal where expected (200 samples)") {
    import graft.ml.Kernel
    val kernels = Seq[Kernel](Kernel.Linear, Kernel.Rbf(0.3),
      Kernel.Laplacian(0.3), Kernel.Polynomial(0.1, 1.0, 2))
    for (_ <- 1 to 200) {
      val a = vec(); val b = vec()
      for (k <- kernels)
        assert(math.abs(k(a, b) - k(b, a)) < 1e-9, s"${k.name} symmetric")
      assert(Kernel.Rbf(0.3)(a, a) === 1.0)
      assert(Kernel.Laplacian(0.3)(a, a) === 1.0)
    }
  }
}
