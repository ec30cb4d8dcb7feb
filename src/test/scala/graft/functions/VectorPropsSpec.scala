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

  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  test("fused hash kernel properties (200 samples)") {
    for (_ <- 1 to 200) {
      val a = lset().toArray.sorted
      val b = lset().toArray.sorted
      // merge-intersect equals set intersection
      val got = HashUtil.sortedIntersectSize(
        new GenericArrayData(a), new GenericArrayData(b))
      assert(got === a.toSet.intersect(b.toSet).size)
      // minhash signature/band keys: permutation- and duplicate-invariant
      // (they are set functions of the elements)
      val perm = rng.shuffle(a.toSeq) ++ Seq(a.head)   // shuffled + a dup
      val s1 = HashUtil.minhashSignature(new GenericArrayData(a), 16).toSeq
      val s2 = HashUtil.minhashSignature(new GenericArrayData(perm.toArray), 16).toSeq
      assert(s1 === s2, "minhash is a set function")
      val k1 = HashUtil.minhashBandKeys(new GenericArrayData(a), 4, 4).toSeq
      val k2 = HashUtil.minhashBandKeys(new GenericArrayData(perm.toArray), 4, 4).toSeq
      assert(k1 === k2, "band keys are a set function")
    }
  }

  test("simhash64 is permutation-invariant and equal strings collide (100 samples)") {
    def toks(n: Int): Array[UTF8String] =
      Array.fill(n)(UTF8String.fromString("w" + rng.nextInt(30)))
    for (_ <- 1 to 100) {
      val t = toks(3 + rng.nextInt(15))
      val shuffled = rng.shuffle(t.toSeq).toArray
      for (md5 <- Seq(true, false)) {
        val h1 = HashUtil.simhash64(new GenericArrayData(t.asInstanceOf[Array[AnyRef]]), md5)
        val h2 = HashUtil.simhash64(new GenericArrayData(shuffled.asInstanceOf[Array[AnyRef]]), md5)
        assert(h1 === h2, "simhash votes are order-independent")
      }
    }
  }

  test("fused shingle builders emit sorted distinct arrays (100 samples)") {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    for (_ <- 1 to 100) {
      val text = UTF8String.fromString(
        Seq.fill(1 + rng.nextInt(12))(words(rng.nextInt(words.length))).mkString(" "))
      for (arr <- Seq(HashUtil.tokenShingleHashes(text, 3),
                      HashUtil.charNgramHashes(text, 3))) {
        assert(arr.toSeq === arr.toSeq.sorted, "sorted")
        assert(arr.toSet.size === arr.length, "distinct")
        assert(arr.nonEmpty)
      }
    }
  }
}
