package graft.multimodal

import graft.SparkSpec

class VideoOpsSpec extends SparkSpec {

  private def samplePayload(): Array[Byte] = {
    import org.apache.spark.sql.functions._
    VideoOps.videoFromDocuments(spark, "/root/testdata/sf0.001")
      .orderBy(col("media_id")).limit(1)
      .select(col("payload")).collect().head.getAs[Array[Byte]](0)
  }

  test("avi decode: header fields, frame count and frame bytes round-trip") {
    val p = samplePayload()
    val (us, total, w, h, frames) = VideoOps.decodeAvi(p)
    assert(us == VideoOps.MicrosPerFrame && total == VideoOps.Frames)
    assert(w == VideoOps.Width && h == VideoOps.Height)
    assert(frames.length == VideoOps.Frames)
    assert(frames.forall(_.length == VideoOps.FrameBytes))
    // the frame bytes are exactly the payload tail laid out per chunk
    val moviStart = VideoOps.aviPrefix.length
    val first = java.util.Arrays.copyOfRange(p, moviStart + 8,
      moviStart + 8 + VideoOps.FrameBytes)
    assert(frames(0).sameElements(first), "frame 0 must match its chunk bytes")
  }

  test("avi decode: rejects non-AVI and corrupt chunk sizes; skips JUNK") {
    val p = samplePayload()
    // JUNK is planted between hdrl and movi — decode already proves the
    // walker skips it; now corrupt a chunk size and expect a clean reject
    intercept[IllegalArgumentException] {
      VideoOps.decodeAvi("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    val corrupt = p.clone()
    // overwrite the first 00db chunk's size with a huge value
    val bb = java.nio.ByteBuffer.wrap(corrupt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(VideoOps.aviPrefix.length + 4, Int.MaxValue - 8)
    intercept[IllegalArgumentException] { VideoOps.decodeAvi(corrupt) }
  }

  test("mm5 samples frames 0 and 2 and reads the top-left pixel from the last DIB row") {
    import org.apache.spark.sql.functions._
    val rows = VideoOps.videoFrameFeatures(spark, "/root/testdata/sf0.001")
      .filter(col("media_id") === 0).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 2L), "every 2nd frame sampled")
    val p = samplePayload()
    val (_, _, w, h, frames) = VideoOps.decodeAvi(p)
    val off = (h - 1) * w * 3
    val expect = (frames(0)(off) & 0xff) + (frames(0)(off + 1) & 0xff) +
      (frames(0)(off + 2) & 0xff)
    assert(rows.head.getLong(9) == expect.toLong)
    assert(rows.head.getLong(2) == 10L, "fps must come from the parsed avih")
  }
}
