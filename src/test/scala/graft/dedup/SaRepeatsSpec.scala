package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaRepeatsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: for each doc and level ℓ, count positions whose
    * ℓ-char substring occurs ≥ 2 times anywhere in the corpus. */
  private def bruteReps(docs: Seq[(Long, String)], level: Int): Map[Long, Long] = {
    // split by CODE POINT (Java's split("") halves surrogate pairs —
    // the engine semantics under test are code-point based)
    def cpsOf(t: String) = graft.text.UnigramLm.codePoints(t)
    val counts = scala.collection.mutable.Map[String, Int]()
    docs.foreach { case (_, t) =>
      val cps = cpsOf(t)
      (0 to cps.length - level).foreach { p =>
        val s = cps.slice(p, p + level).mkString
        counts(s) = counts.getOrElse(s, 0) + 1
      }
    }
    docs.map { case (id, t) =>
      val cps = cpsOf(t)
      id -> (0 to cps.length - level).count { p =>
        counts(cps.slice(p, p + level).mkString) >= 2
      }.toLong
    }.toMap
  }

  private def charsOf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select($"doc_id", posexplode(filter(split($"text", ""), x => x =!= lit(""))))
      .withColumnRenamed("col", "ch")

  test("doubling ranks classify repeats exactly: every level matches brute force on a crafted corpus") {
    // cross-doc repeat ('abcd'), intra-doc repeat ('qq'×), unique tails,
    // multibyte (𝄞 pair shared across docs)
    val docs = Seq[(Long, String)](
      (1L, "abcdefgh𝄞xy"), (2L, "zzabcdzz𝄞xy"), (3L, "qqqqqq"), (4L, "unique1"))
    val chars = charsOf(docs).persist()
    // both label strategies must agree with brute force: the default
    // schedule packs on a corpus this small; densifyAbove = 1 forces
    // the contiguous-relabel path on every round
    // every (label strategy × pruning schedule) combination must agree
    // with brute force: packed vs forced-densify, and never-prune (0)
    // vs default vs prune-from-round-one (2.0)
    for (densifyAbove <- Seq(3000000000L, 1L); pruneBelow <- Seq(0.0, 0.5, 2.0)) {
      val levels = SaRepeats.repLadder(chars, 8, densifyAbove, pruneBelow)
      levels.foreach { case (k, t) =>
        val got = t.as[(Long, Long)].collect().toMap
        val want = bruteReps(docs, k).filter(_._2 > 0)
        assert(got == want,
          s"level $k (densifyAbove=$densifyAbove pruneBelow=$pruneBelow): got $got want $want")
      }
    }
  }

  test("singleton pruning is invisible: pruned and unpruned ladders agree level-for-level") {
    // a corpus where pruning bites mid-ladder: heavy short repeats that
    // die out by level 4 plus one long cross-doc repeat that must
    // survive pruning all the way to level 8
    val long = "thequickbrownfox" // 16 chars, shared by docs 1 and 2
    val docs = Seq[(Long, String)](
      (1L, long + "aaaaabbbbb"), (2L, "ccddcc" + long),
      (3L, "aabbccddee0123456789"), (4L, "xyxyxyxy"))
    val chars = charsOf(docs).persist()
    val unpruned = SaRepeats.repLadder(chars, 16, pruneBelow = 0.0)
      .map { case (k, t) => k -> t.as[(Long, Long)].collect().toMap }.toMap
    val pruned = SaRepeats.repLadder(chars, 16, pruneBelow = 2.0)
      .map { case (k, t) => k -> t.as[(Long, Long)].collect().toMap }.toMap
    assert(unpruned.keySet == pruned.keySet)
    unpruned.foreach { case (k, want) =>
      assert(pruned(k) == want, s"level $k: pruned ${pruned(k)} != unpruned $want")
      assert(want == bruteReps(docs, k).filter(_._2 > 0), s"level $k vs brute force")
    }
    // the 16-char repeat must be visible at the top level from both paths
    assert(pruned(16).getOrElse(1L, 0L) >= 1, "long repeat lost by pruning")
  }

  test("p33c query: rep counts are monotone non-increasing in level and match brute force at level 16") {
    val dir = "/root/testdata/sf0.001"
    val out = SaRepeats.query(spark, dir).collect()
    assert(out.length == 500)
    val levels = Iterator.iterate(1)(_ * 2).takeWhile(_ <= SaRepeats.MaxLevel).toSeq
    out.foreach { r =>
      levels.sliding(2).foreach { case Seq(a, b) =>
        assert(r.getAs[Long](s"rep_$a") >= r.getAs[Long](s"rep_$b"),
          s"rep not monotone on doc ${r.getAs[Long]("doc_id")}")
      }
      assert(r.getAs[Long]("rep_1") <= r.getAs[Long]("n_chars"))
    }
    // independent cross-check of one mid-ladder level against brute force
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val want16 = bruteReps(docs, 16)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("rep_16") == want16(id),
        s"rep_16 mismatch on doc $id: got ${r.getAs[Long]("rep_16")} want ${want16(id)}")
    }
  }
}
