package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SceneCutsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("scene video: payload is a valid AVI whose frames repeat per scene block") {
    val row = SceneCuts.sceneVideoFromDocuments(spark, dir)
      .orderBy(col("media_id")).limit(1)
      .select(col("media_id"), col("payload"), col("planted_cut")).collect().head
    val plant = row.getLong(2)
    val (_, _, w, h, frames) = VideoOps.decodeAvi(row.getAs[Array[Byte]](1))
    assert(w == VideoOps.Width && h == VideoOps.Height)
    assert(frames.length == VideoOps.Frames)
    assert(plant >= 1 && plant <= 3)
    // frames within a scene are byte-identical; across the boundary not
    for (f <- 1 until frames.length) {
      val same = frames(f).sameElements(frames(f - 1))
      assert(same == (f != plant), s"frame $f vs ${f - 1}: same=$same plant=$plant")
    }
  }

  test("mm8: exactly one cut per clip, at the planted boundary, with SAD >= threshold") {
    val out = SceneCuts.query(spark, dir) // in-query gate already enforces the plant
    val cuts = out.filter(col("frame_idx") > 0)
      .select(col("media_id"), col("frame_idx"), col("sad_prev")).collect()
    val plants = SceneCuts.sceneVideoFromDocuments(spark, dir)
      .select(col("media_id"), col("planted_cut")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cuts.length == plants.size, "one cut per clip")
    cuts.foreach { r =>
      assert(r.getLong(1) == plants(r.getLong(0)))
      assert(r.getLong(2) >= SceneCuts.CutThreshold)
    }
    // frame 0 is always a keyframe with null SAD
    val zeros = out.filter(col("frame_idx") === 0)
    assert(zeros.count() == plants.size)
    assert(zeros.filter(col("sad_prev").isNotNull).count() == 0)
  }
}
