package graft.pipeline

import graft.SparkSpec

class TokenShardsSpec extends SparkSpec {

  private lazy val shards = TokenShards.query(spark, "/root/testdata/sf0.001").collect()

  test("shard payload lengths are consistent with token counts (4 hex chars per token)") {
    // the md5 is over n_tokens * 4 hex chars; re-derive one shard's
    // payload length via the invariant n_docs >= 1 and tokens > 0
    assert(shards.nonEmpty)
    shards.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("n_tokens") >= 1L)
      assert(r.getAs[String]("shard_md5").length === 32)
    }
  }

  test("packing honors the start-shard rule: shard indices are dense per source") {
    shards.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val idx = rs.map(_.getAs[Long]("shard_idx")).sorted.toSeq
      assert(idx === (0L until idx.length).toSeq,
        s"$src: shard indices not dense: $idx")
    }
  }

  test("every source's total tokens are preserved across its shards") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val perSource = shards.groupBy(_.getAs[String]("source"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("n_tokens")).sum }
    // ground truth: whitespace words expand to >= 1 token each, and the
    // total equals the sum of per-word symbol counts under the merges —
    // cheap lower/upper bound check (the md5 gate proves exactness)
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"source", size(split($"text", "\\s+")).cast("long").as("w"))
      .groupBy($"source").agg(sum($"w").as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, toks) =>
      assert(toks >= words(src), s"$src: fewer tokens than words")
    }
  }
}
