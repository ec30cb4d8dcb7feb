package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("media table has typed metadata and binary payloads") {
    val m = MultimodalOps.mediaFromDocuments(spark, dir)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.select("kind").distinct().as[String].collect().toSet ===
      Set("image", "audio", "video"))
    val r = m.select(length($"payload")).head()
    assert(r.getInt(0) === 16, "md5 payload is 16 bytes")
  }

  test("stub decode produces 32 intensities in [0,1] and stable features") {
    val f = MultimodalOps.mediaFeatures(spark, dir)
    val rows = f.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val mn = r.getAs[Double]("min_px"); val mx = r.getAs[Double]("max_px")
      assert(mn >= 0.0 && mx <= 1.0 && mn <= mx)
      assert(r.getAs[Double]("std_px") >= 0.0)
    }
  }

  test("frame sampling explodes videos into 4 frames") {
    val media = MultimodalOps.mediaFromDocuments(spark, dir)
    val nVideos = media.filter($"kind" === "video").count()
    val frames = MultimodalOps.frameSample(spark, dir)
    assert(frames.count() === nVideos * 4)
    assert(frames.select(max($"frame_idx")).head.getLong(0) === 3L)
  }

  test("batched scoring preserves rows and respects batch size") {
    val media = MultimodalOps.mediaFromDocuments(spark, dir)
      .select($"media_id", $"payload_hex")
      .as[MultimodalOps.MediaRow]
    val scored = MultimodalOps.batchScore(media, batchSize = 32).collect()
    assert(scored.length === 500)
    assert(scored.forall(s => s.batch_size <= 32 && s.batch_size >= 1))
    assert(scored.forall(s => s.score >= 0.0 && s.score <= 1.0))
  }
}
