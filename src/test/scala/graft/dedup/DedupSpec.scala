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
      .withColumn("__toks", split($"text", "\\s+"))
      .select($"doc_id", SimHashDedup.simhashBits("__toks").as("bits"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Int](1))
      .toMap
    def h(a: Long, b: Long): Int =
      sigs(a).zip(sigs(b)).count { case (x, y) => x != y }
    assert(h(1L, 5L) === 0, "identical docs have hamming 0")
    assert(h(1L, 2L) < h(1L, 3L), "1-token edit closer than unrelated doc")
    assert(h(1L, 2L) < h(1L, 4L), "1-token edit closer than unrelated doc")
    // banding guarantees candidates for hamming <= Bands-1 = 3
    val pairs = SimHashDedup.nearDuplicatePairs(corpus, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)), "exact dup pair surfaces via banding")
    assert(!pairs.contains((3L, 4L)), "unrelated docs not paired")
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
}
