package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized HOF-parity fuzzing of the load-bearing hash kernels: each
  * fused codegen Expression is replayed through the equivalent
  * composition of Spark BUILT-INS (an independent execution path —
  * different codegen, same defined semantics) on adversarial inputs:
  * multibyte text (the char-offset vs byte-offset trap), duplicates,
  * nulls, empties, boundary window sizes.
  */
class HashParityFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(4242)
  // alphabet with 1-, 2-, 3- and 4-byte UTF-8 code points
  private val glyphs = "ab zq09éüñ中文界🙂🚀".toCharArray
    .mkString.codePoints().toArray

  private def randText(maxLen: Int): String = {
    val n = rng.nextInt(maxLen + 1)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach(_ => sb.appendCodePoint(glyphs(rng.nextInt(glyphs.length))))
    sb.toString
  }

  test("char_window_hash_seq == xxhash64(substring) per window on multibyte text (300 docs)") {
    val k = 5
    val docs = (0 until 300).map(i => (i.toLong, randText(40))).toDF("id", "text")
    val out = docs.select($"id",
        HashFunctions.char_window_hash_seq($"text", k).as("fused"),
        when(length($"text") >= k,
          expr(s"transform(sequence(0, length(text) - $k), i -> xxhash64(substring(text, i + 1, $k)))"))
          .otherwise(expr("array(xxhash64(text))")).as("hof"),
        length($"text").as("len"))
      .collect()
    out.foreach { r =>
      val fused = r.getSeq[Long](1)
      val hof = r.getSeq[Long](2)
      assert(fused == hof, s"id ${r.getLong(0)} len ${r.getInt(3)}: $fused vs $hof")
    }
  }

  test("minhash_signature == HOF per-seed array_min form (200 sets, incl. empty/dup)") {
    val k = 16
    val rows = (0 until 200).map { i =>
      val n = if (i % 17 == 0) 0 else 1 + rng.nextInt(30)
      val base = Array.fill(n)(rng.nextLong())
      // plant duplicates: min is idempotent under them
      val elems = if (n > 2 && i % 3 == 0) base ++ base.take(2) else base
      (i.toLong, elems)
    }.toDF("id", "sh")
    val out = rows.select($"id", size($"sh").as("n"),
        HashFunctions.minhash_signature($"sh", k).as("fused"),
        expr(s"transform(sequence(0, ${k - 1}), s -> array_min(transform(sh, e -> xxhash64(e, CAST(s AS INT)))))")
          .as("hof"))
      .collect()
    out.foreach { r =>
      val fused = r.getSeq[Long](2)
      if (r.getInt(1) == 0) {
        // documented divergence: empty set → MaxValue sentinel (HOF: nulls)
        assert(fused.forall(_ == Long.MaxValue))
      } else {
        assert(fused == r.getSeq[Long](3), s"id ${r.getLong(0)}")
      }
    }
  }

  test("minhash_band_keys: equal sets collide on all bands, disjoint sets on none; empty emits nothing (100 sets)") {
    val (bands, rpb) = (8, 4)
    val rows = (0 until 100).map { i =>
      val elems = Array.fill(1 + rng.nextInt(20))(rng.nextLong())
      (i.toLong, elems, rng.shuffle(elems.toSeq).toArray) // same set, shuffled order
    }.toDF("id", "sh_a", "sh_b")
    val out = rows.select(
        HashFunctions.minhash_band_keys($"sh_a", bands, rpb).as("ka"),
        HashFunctions.minhash_band_keys($"sh_b", bands, rpb).as("kb"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        "band keys must be order-invariant over the element set")
    }
    val empty = Seq((1L, Array.empty[Long])).toDF("id", "sh")
      .select(HashFunctions.minhash_band_keys($"sh", bands, rpb).as("k"))
      .collect().head.getSeq[Long](0)
    assert(empty.isEmpty, "empty sets must emit no band keys")
  }

  test("remove_char_positions == pure-Scala reference on multibyte text (300 docs)") {
    val docs = (0 until 300).map { i =>
      val t = randText(30)
      val nChars = t.codePointCount(0, t.length)
      val pos = (1 to nChars).filter(_ => rng.nextBoolean()).toArray // sorted 1-based
      (i.toLong, t, pos)
    }
    def reference(t: String, pos: Array[Int]): String = {
      val drop = pos.toSet
      val sb = new java.lang.StringBuilder
      var idx = 1
      val it = t.codePoints().iterator()
      while (it.hasNext) {
        val cp = it.nextInt()
        if (!drop.contains(idx)) sb.appendCodePoint(cp)
        idx += 1
      }
      sb.toString
    }
    val out = docs.toDF("id", "text", "pos")
      .select($"id", $"text", $"pos",
        HashFunctions.remove_char_positions($"text", $"pos").as("kept"))
      .collect()
    out.foreach { r =>
      val want = reference(r.getString(1), r.getSeq[Int](2).toArray)
      assert(r.getString(3) == want,
        s"id ${r.getLong(0)}: '${r.getString(3)}' vs '$want' for '${r.getString(1)}'")
    }
  }

  test("sorted_intersect_size == reference intersection count (200 pairs)") {
    def sortedDistinct(a: Array[Long]) = a.distinct.sorted
    val rows = (0 until 200).map { i =>
      val pool = Array.fill(30)(rng.nextInt(40).toLong)
      val a = sortedDistinct(Array.fill(1 + rng.nextInt(20))(pool(rng.nextInt(pool.length))))
      val b = sortedDistinct(Array.fill(1 + rng.nextInt(20))(pool(rng.nextInt(pool.length))))
      (i.toLong, a, b, a.toSet.intersect(b.toSet).size)
    }.toDF("id", "a", "b", "want")
    val out = rows.select($"want",
        HashFunctions.sorted_intersect_size($"a", $"b").as("got")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
