package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("media table has typed metadata and real BMP payloads") {
    val m = MultimodalOps.mediaFromDocuments(spark, dir)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.select("kind").distinct().as[String].collect().toSet ===
      Set("image", "audio", "video"))
    val r = m.select(length($"payload")).head()
    assert(r.getInt(0) === 54 + 96, "54-byte BMP header + 8x4x3 pixels")
    // the payload is a DECODABLE image, not just tagged bytes
    val payload = m.select($"payload").head().getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null && img.getWidth === 8 && img.getHeight === 4)
  }

  test("decode inverts encode: raster values equal the generated pixel bytes") {
    // round-trip through the real codec: encode text-derived bytes into a
    // BMP, decode with ImageIO, compare against the bytes that went in
    val row = MultimodalOps.mediaFromDocuments(spark, dir)
      .select($"payload").head().getAs[Array[Byte]](0)
    val decoded = MultimodalOps.decodeBmp(row)
    assert(decoded.length === 96)
    val expected = row.drop(54).map(b => (b & 0xFF) / 255.0)
    assert(decoded.toSeq === expected.toSeq,
      "file-order traversal must reproduce the payload's pixel bytes")
  }

  test("decoded features are in range and stable") {
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
      .select($"media_id", $"payload")
      .as[MultimodalOps.MediaRow]
    val scored = MultimodalOps.batchScore(media, batchSize = 32).collect()
    assert(scored.length === 500)
    assert(scored.forall(s => s.batch_size <= 32 && s.batch_size >= 1))
    assert(scored.forall(s => s.score >= 0.0 && s.score <= 1.0))
  }
  test("mm6 resize: output raster is the 2x nearest-neighbor sample, re-decoded") {
    val m = MultimodalOps.mediaFromDocuments(spark, dir)
      .filter($"kind" === "image")
      .select($"media_id", $"payload")
      .orderBy($"media_id").limit(1).collect().head
    val src = MultimodalOps.decodeBmp(m.getAs[Array[Byte]]("payload"))
    val out = MultimodalOps.resize(spark, dir)
      .filter($"media_id" === m.getAs[Long]("media_id")).collect().head
    assert(out.getAs[Int]("out_w") === 4 && out.getAs[Int]("out_h") === 2)
    // recompute the expected sampled hex by the same file-order rule
    val hex = (0 until 24).map { i =>
      val b = Math.round(src((2 * (i / 12)) * 24 + 2 * ((i % 12) / 3) * 3 + (i % 3)) * 255.0).toInt
      f"$b%02x"
    }.mkString
    def md5Of(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getAs[String]("px_md5") === md5Of(hex),
      "resized raster must be exactly the NN-sampled source pixels")
  }

  test("mm6 resize: plan is a narrow map, no shuffle") {
    val plan = MultimodalOps.resize(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

}
