package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank " +
    "while the sun sets slowly behind the tall green mountain ridge today"
  private val nearDup = base.replace("slowly", "quickly")   // 1-token edit
  private val distinct1 =
    "completely different content about database engines and query planners " +
    "optimizing join order with cost models and cardinality estimates"
  private val distinct2 =
    "yet another unrelated passage describing streaming watermarks windows " +
    "and stateful aggregation semantics in modern dataflow systems"

  private def corpus = Seq(
    (1L, base), (2L, nearDup), (3L, distinct1), (4L, distinct2), (5L, base),
  ).toDF("doc_id", "text")

  test("exact dedup finds planted identical docs and keeps min id") {
    val groups = ExactDedup.duplicateGroups(corpus, "text", "doc_id").collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("n_copies") === 2)
    assert(groups.head.getAs[Long]("keep_id") === 1L)
    val kept = ExactDedup.deduplicate(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 2L, 3L, 4L))
  }

  test("minhash LSH finds the near-dup pair and skips unrelated docs") {
    val pairs = MinHashDedup.nearDuplicatePairs(corpus, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)), "exact dups too")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "doc 3 unrelated")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "doc 4 unrelated")
  }

  test("simhash: identical docs collide; near-dup closer than unrelated") {
    val sigs = corpus
      .select($"doc_id",
        SimHashDedup.signature(split($"text", "\\s+")).as("sig"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig"))
      .toMap
    def h(a: Long, b: Long): Int = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(h(1L, 5L) === 0, "identical docs have hamming 0")
    assert(h(1L, 2L) < h(1L, 3L), "1-token edit closer than unrelated doc")
    assert(h(1L, 2L) < h(1L, 4L), "1-token edit closer than unrelated doc")
    // banding guarantees candidates for hamming <= Bands-1 = 3
    val pairs = SimHashDedup.nearDuplicatePairs(corpus, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)), "exact dup pair surfaces via banding")
    assert(!pairs.contains((3L, 4L)), "unrelated docs not paired")
  }

  test("similarity join matches across sides only, and self-matches at J=1") {
    val left = Seq((10L, base), (30L, distinct1)).toDF("doc_id", "text")
    val right = Seq((21L, nearDup), (41L, distinct2), (51L, base)).toDF("doc_id", "text")
    val out = SimilarityJoin.similarPairs(left, right, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.contains((10L, 21L)), "near-dup pair found across sides")
    assert(out((10L, 51L)) === 1.0, "identical doc on both sides matches at J=1")
    assert(!out.keySet.exists(p => p._1 == 30L || p._2 == 41L),
      "unrelated docs not joined")
    // same-side near-dups (10 vs 51 both on one side) must NOT pair:
    val sameSide = SimilarityJoin.similarPairs(
      left.union(right.filter($"doc_id" === 51L)), right.filter($"doc_id" === 41L),
      "doc_id", "text", 0.5).collect()
    assert(sameSide.isEmpty, "left-left pairs leaked into the bipartite join")
  }

  test("composite simhash keys: every hamming<=3 pair shares a key (double pigeonhole)") {
    // deterministic pseudo-random sigs + up-to-3 bit flips; the claim is
    // recall = 1.0 BY CONSTRUCTION, so one shared key must exist for
    // every such pair regardless of which bits flip
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val a = rnd.nextLong()
      val flips = rnd.nextInt(4) // 0..3 bits
      val b = (0 until flips).foldLeft(a)((s, _) => s ^ (1L << rnd.nextInt(64)))
      (i.toLong, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val shared = df.select($"i",
        arrays_overlap(array(SimHashDedup.compositeKeys($"a"): _*),
                       array(SimHashDedup.compositeKeys($"b"): _*)).as("hit"))
      .filter(!$"hit").count()
    assert(shared === 0L, "a hamming<=3 pair failed to share a composite key")
  }

  test("fused minhash signature is bit-identical to the round-1 HOF form") {
    val sets = Seq(
      (1L, Seq(12L, -9812L, 55L, 0L, 7738291L)),
      (2L, Seq(Long.MaxValue, Long.MinValue, 42L)),
      (3L, Seq(5L)),
    ).toDF("id", "sh")
    val hof = expr(
      "transform(sequence(0, 63), s -> array_min(transform(sh, e -> xxhash64(e, s))))")
    val rows = sets
      .select(MinHashDedup.signature($"sh", 64).as("fused"), hof.as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (f, h) => assert(f === h) }
  }

  test("fused shingle+hash set builders equal the HOF pipelines bit-for-bit") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "ab"),                            // shorter than one window
      (3L, " leading  and trailing spaces "),
      (4L, "internationalization"),
    ).toDF("id", "text")
    val hofTok = expr(
      "array_sort(array_distinct(transform(" +
      "transform(sequence(1, greatest(size(split(text, '\\\\s+')) - 2, 1)), " +
      "i -> concat_ws(' ', slice(split(text, '\\\\s+'), i, 3))), x -> xxhash64(x))))")
    val hofNg = expr(
      "array_sort(array_distinct(transform(" +
      "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3)), " +
      "x -> xxhash64(x))))")
    import graft.functions.HashFunctions
    texts.select(
        HashFunctions.token_shingle_hashes($"text", 3).as("f_tok"), hofTok.as("h_tok"),
        HashFunctions.char_ngram_hashes($"text", 3).as("f_ng"), hofNg.as("h_ng"))
      .as[(Seq[Long], Seq[Long], Seq[Long], Seq[Long])].collect()
      .foreach { case (ft, ht, fn, hn) =>
        assert(ft === ht, "token shingle hashes")
        assert(fn === hn, "char ngram hashes")
      }
  }

  test("bucket cap drops a pathological bucket but keeps planted near-dups") {
    // 30 docs with IDENTICAL text share every band bucket -> bucket size
    // 30 > cap 8 -> all their buckets dropped; the distinct near-dup pair
    // lives in its own buckets and must survive.
    val boiler = (100L until 130L).map(i => (i, "common boilerplate legal footer " * 6))
    val c = (corpus.collect().map(r => (r.getLong(0), r.getString(1))) ++ boiler)
      .toSeq.toDF("doc_id", "text")
    val capped = MinHashDedup.nearDuplicatePairs(c, "doc_id", "text", 0.5,
        maxBucketSize = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)), "planted near-dup survives the cap")
    assert(!capped.exists(p => p._1 >= 100L), "boilerplate bucket dropped")
    val uncapped = MinHashDedup.nearDuplicatePairs(c, "doc_id", "text", 0.5,
        maxBucketSize = 10000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count(p => p._1 >= 100L) === 30 * 29 / 2,
      "uncapped finds the full quadratic boilerplate clique")
  }

  test("char-ngram jaccard catches in-word edits") {
    val c = Seq(
      (1L, "internationalization conference proceedings archive volume"),
      (2L, "internationalisation conference proceedings archive volume"),  // s/z edit
      (3L, "synchronous generators produce alternating current power"),
    ).toDF("doc_id", "text")
    val pairs = NgramJaccard.similarPairs(c, "doc_id", "text", 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("bucket-local verification emits exactly the join-verified pair set") {
    // sf0.001 documents: real planted near-dups + unrelated docs; the
    // in-bucket path (one fat shuffle, row-local Jaccard, dedup after)
    // must equal the candidate-join path pair for pair, jaccard for
    // jaccard — including bucket-cap behavior
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sets = docs.select($"doc_id".as("id"),
      graft.functions.HashFunctions.char_ngram_hashes($"text", 3).as("sh"))
    val inBucket = MinHashDedup.verifiedPairsByHashed(sets, 0.9, bands = 8, rowsPerBand = 8)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val joined = MinHashDedup.candidatePairsByHashed(sets, bands = 8, rowsPerBand = 8)
      .withColumn("jaccard", round(MinHashDedup.jaccardSorted($"sh_a", $"sh_b"), 6))
      .filter($"jaccard" >= 0.9)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(inBucket === joined)
    assert(inBucket.nonEmpty, "fixture must exercise the verify path")
  }

  test("LSH-blocked embedding dedup: recall 1.0 on planted near-identical vectors") {
    val rng = new scala.util.Random(11)
    val dim = 64
    def randVec() = Array.fill(dim)(rng.nextGaussian().toFloat)
    val bases = (0 until 20).map(i => (i.toLong * 2, randVec()))
    // plant a near-identical twin for each base (tiny perturbation)
    val twins = bases.map { case (id, v) =>
      (id + 1, v.map(x => x + rng.nextGaussian().toFloat * 0.01f))
    }
    val df = (bases ++ twins).toDF("vec_id", "embedding")
    val exact = EmbeddingDedup.nearDupPairs(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = EmbeddingDedup.nearDupPairsLsh(df, "vec_id", "embedding", 0.95, dim = dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 20, s"planted twins should be near-dups, got ${exact.size}")
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"LSH recall vs exact: $recall%.3f (${lsh.size} of ${exact.size})")
    assert(recall >= 0.95, s"planted near-identical pairs must be found, recall=$recall")
    assert(lsh.subsetOf(exact), "verification keeps precision exact")
  }

  test("connected components label chained near-dups with the min id") {
    // chain 1-2, 2-3 plus isolated pair 7-9: components {1,2,3} and {7,9}
    val edges = Seq((2L, 1L), (2L, 3L), (9L, 7L)).toDF("src", "dst")
    val comp = DedupClusters.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    // a longer chain still converges (diameter > 2)
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp2 = DedupClusters.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(comp2.values.toSet === Set(1L), "one component labeled by min id")
    assert(comp2.keySet === (1L to 8L).toSet)
  }

  test("large-star/small-star clusters a 10k-vertex path graph in O(log n) rounds") {
    // a path graph is the adversarial case for label propagation
    // (diameter = n); the star algorithm must converge inside 20 rounds,
    // and maxIter = 20 makes the bound an assertion (it throws past it)
    val n = 10000L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = DedupClusters.connectedComponentsStar(chain, maxIter = 20)
      .as[(Long, Long)].collect()
    assert(comp.length === n.toInt)
    assert(comp.forall(_._2 === 1L), "every vertex labeled with the component min")
    // the guarded entry point finishes the same graph by handing off
    val viaGuard = DedupClusters.connectedComponents(chain, maxIter = 20,
        starSwitchRounds = 3)
      .as[(Long, Long)].collect()
    assert(viaGuard.length === n.toInt && viaGuard.forall(_._2 === 1L))
    // star algorithm agrees with label propagation on a branchy graph
    val edges = Seq((2L, 1L), (2L, 3L), (9L, 7L), (3L, 5L)).toDF("src", "dst")
    val star = DedupClusters.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().toMap
    assert(star === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("keep-best selection keeps the highest-quality doc per cluster, min id on ties") {
    val dir = "/root/testdata/sf0.001"
    val out = DedupClusters.keepBestQuery(spark, dir)
      .select("cluster_id", "n_members", "kept_doc_id").collect()
    // structural invariants that hold for ANY corpus: the kept doc is a
    // member of its own cluster, clusters have >= 2 members (singletons
    // never enter the pair graph), and cluster ids are the member min
    val clusters = DedupClusters.query(spark, dir)
      .as[(Long, Long)].collect().groupBy(_._2).map { case (c, ms) => (c, ms.map(_._1).toSet) }
    assert(out.nonEmpty, "sf0.001 plants at least one near-dup cluster")
    out.foreach { r =>
      val (cid, n, kept) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(clusters(cid).contains(kept), s"kept $kept not in cluster $cid")
      assert(n === clusters(cid).size.toLong)
      assert(cid === clusters(cid).min)
    }
    // deterministic tie-break: identical copies carry identical rounded
    // quality, so a kept id must be reproducible run to run
    val again = DedupClusters.keepBestQuery(spark, dir)
      .select("cluster_id", "n_members", "kept_doc_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("embedding near-dup pairs at threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.04f, 0.0f)),    // ~same direction
      (3L, Array(0.0f, 1.0f, 0.0f)),       // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = EmbeddingDedup.nearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("incremental dedup decisions agree with the live bipartite verify") {
    val dir = "/root/testdata/sf0.001"
    val out = IncrementalDedup.query(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
         r.getBoolean(4))).toMap
    // independent ground truth via the LIVE two-table join (different
    // plan: side-tagged bucket aggregation vs persisted-index probe)
    val docs = graft.Tables.documents(spark, dir)
    val truth = SimilarityJoin
      .similarPairs(docs.filter($"doc_id" % 2 === 0),
                    docs.filter($"doc_id" % 2 === 1), "doc_id", "text", 0.8)
      .groupBy($"rid").agg(min($"lid").as("nd"))
      .as[(Long, Long)].collect().toMap
    val exacts = docs.filter($"doc_id" % 2 === 1).select($"doc_id", md5($"text").as("m"))
      .join(docs.filter($"doc_id" % 2 === 0).select(md5($"text").as("m")).distinct(), Seq("m"))
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    out.foreach { case (id, (ex, nd, keep)) =>
      assert(ex === exacts.contains(id), s"exact flag for $id")
      assert(nd === truth.get(id), s"near_dup_of for $id")
      assert(keep === (!ex && nd.isEmpty), s"keep bit for $id")
    }
    assert(out.values.exists(_._2.nonEmpty),
      "sf0.001 plants at least one cross-parity near-dup")
  }

  test("duplicated-span removal drops exactly the cross-doc shared span") {
    // a 8-word span planted in docs 10 and 11 amid otherwise-unique
    // words; doc 12 shares nothing; doc 13 is SHORTER than k and a full
    // copy of doc 14's text (the truncated-gram branch)
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val docsDf = Seq(
      (10L, s"u1 u2 u3 $span u4 u5 u6"),
      (11L, s"v1 v2 $span v3 v4 v5 v6 v7"),
      (12L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (13L, "short shared tiny doc"),
      (14L, "short shared tiny doc"),
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(docsDf, 8)
      .select("doc_id", "n_words", "n_dup_words", "kept_md5")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // the planted span is the ONLY gram shared by 2+ docs among 10/11;
    // coverage is the span's 8 words (a single k-window each)
    assert(out(10L)._1 === 14 && out(10L)._2 === 8, s"doc10: ${out(10L)}")
    assert(out(11L)._1 === 15 && out(11L)._2 === 8, s"doc11: ${out(11L)}")
    assert(out(12L)._2 === 0, "unique doc loses nothing")
    // rebuilt text drops the span, preserves order
    val md5u = java.security.MessageDigest.getInstance("MD5")
      .digest("u1 u2 u3 u4 u5 u6".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(10L)._3 === md5u, "doc10 re-render = its unique words in order")
    // short-doc full duplication: every word removed, md5 of empty string
    val md5empty = "d41d8cd98f00b204e9800998ecf8427e"
    assert(out(13L)._2 === out(13L)._1 && out(13L)._3 === md5empty)
    assert(out(14L)._2 === out(14L)._1 && out(14L)._3 === md5empty)
  }

  test("byte-gram span removal drops exactly the covered characters") {
    // a 16-char span planted in two docs; k=16 char windows
    val span = "ABCDEFGHIJKLMNOP" // 16 chars
    val docsDf = Seq(
      (20L, s"xx${span}yy"),
      (21L, s"qq1${span}zz2"),
      (22L, "completely unique content here"),
      (23L, "tiny"), // shorter than k, equal to 24 → truncated-gram branch
      (24L, "tiny"),
    ).toDF("doc_id", "text")
    val out = SpanDedup.byteSpans(docsDf, 16)
      .select("doc_id", "n_chars", "n_dup_chars", "kept_md5")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(20L)._1 === 20 && out(20L)._2 === 16 && out(20L)._3 === md5s("xxyy"))
    assert(out(21L)._1 === 22 && out(21L)._2 === 16 && out(21L)._3 === md5s("qq1zz2"))
    assert(out(22L)._2 === 0, "unique doc loses nothing")
    // short identical docs: one truncated whole-doc gram each → all removed
    assert(out(23L)._2 === out(23L)._1 && out(23L)._3 === md5s(""))
    assert(out(24L)._2 === out(24L)._1 && out(24L)._3 === md5s(""))
  }

  test("p33 default window is the published ExactSubstr granularity (50 tokens)") {
    assert(SpanDedup.DefaultK === 50)
    // a 50-word span shared by two docs among filler is removed exactly
    val span = (1 to 50).map(i => s"s$i").mkString(" ")
    val docsDf = Seq(
      (30L, s"a1 a2 $span a3"),
      (31L, s"b1 $span b2 b3 b4"),
      (32L, (1 to 60).map(i => s"c$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(docsDf, SpanDedup.DefaultK)
      .select("doc_id", "n_dup_words").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(30L -> 50L, 31L -> 50L, 32L -> 0L))
  }
}
