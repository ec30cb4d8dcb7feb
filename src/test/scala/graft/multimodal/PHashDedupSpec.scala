package graft.multimodal

import graft.SparkSpec

class PHashDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def bmpOf(pixels: Array[Byte]): Array[Byte] =
    MultimodalOps.bmpHeader ++ pixels

  test("dhash: identical images hash identically; a one-gradient edit flips exactly one bit") {
    val base = Array.tabulate[Byte](96)(i => ((i * 37 + 11) % 251).toByte)
    val h1 = PHashDedup.dHash(MultimodalOps.decodeBmp(bmpOf(base)))
    val h2 = PHashDedup.dHash(MultimodalOps.decodeBmp(bmpOf(base.clone())))
    assert(h1 == h2)
    // invert ONE horizontal gradient: swap two adjacent pixels in row 0
    // that differ in gray sum — only comparisons touching them change
    val edited = base.clone()
    for (c <- 0 until 3) {
      val t = edited(c); edited(c) = edited(3 + c); edited(3 + c) = t
    }
    val h3 = PHashDedup.dHash(MultimodalOps.decodeBmp(bmpOf(edited)))
    val d = java.lang.Long.bitCount(h1 ^ h3)
    assert(d >= 1 && d <= 3, s"swapping adjacent pixels perturbs at most the 3 adjacent comparisons, got $d")
  }

  test("dhash: gray uses integer channel sums — recoverable exactly from decoded intensities") {
    // pixel bytes chosen so B+G+R sums collide across different channel
    // splits; the hash must treat them as equal gray (no float drift)
    val a = new Array[Byte](96)
    val b = new Array[Byte](96)
    // pixel 0: (10, 20, 30) vs (30, 20, 10) — same sum 60
    a(0) = 10; a(1) = 20; a(2) = 30
    b(0) = 30; b(1) = 20; b(2) = 10
    val ha = PHashDedup.dHash(MultimodalOps.decodeBmp(bmpOf(a)))
    val hb = PHashDedup.dHash(MultimodalOps.decodeBmp(bmpOf(b)))
    assert(ha == hb)
  }

  test("mm3 query: banded grouping equals brute-force all-pairs hamming, and the sf0.01 planted dup is caught") {
    import spark.implicits._
    // sf0.01 plants an exact duplicate text → identical image payloads
    val sf001 = "/root/testdata/sf0.01"
    val out = PHashDedup.query(spark, sf001).collect()
    val hashes = out.map(r => (r.getLong(0), r.getLong(1))).toMap
    // ground truth: local all-pairs hamming ≤ 3 over the 500 hashes
    val ids = hashes.keys.toArray.sorted
    val expected = scala.collection.mutable.Map[Long, Long]()
    for (j <- ids.indices; i <- 0 until j) {
      val (a, b) = (ids(i), ids(j))
      if (java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3 &&
          !expected.get(b).exists(_ <= a)) expected(b) = a
    }
    val got = out.filter(!_.getBoolean(3)).map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == expected.toMap,
      "pigeonhole banding must reproduce exact all-pairs hamming grouping")
    assert(got.nonEmpty, "the planted duplicate text must surface as an image dup")
    got.foreach { case (id, of) => assert(of < id) }
  }
}
