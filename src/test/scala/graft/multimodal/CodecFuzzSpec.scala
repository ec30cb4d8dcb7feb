package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

/** Seeded randomized round-trip fuzzing of the real codec paths — pure
  * JVM, no Spark session. The encoders here are written INDEPENDENTLY
  * of the production generators (test-side reference writers), so a
  * shared encode/decode bug cannot cancel out: BMP via the spec'd
  * BITMAPFILEHEADER layout, WAV/AVI via their RIFF chunk grammars with
  * randomized payload shapes, unknown chunks, odd-size word-alignment
  * padding, and corrupted sizes (the infinite-loop / overscan guards).
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  test("bmp: decode inverts the raster for arbitrary pixel bytes (200 seeds)") {
    val rng = new scala.util.Random(1001)
    for (_ <- 1 to 200) {
      val px = Array.fill(MultimodalOps.PixelBytes)((rng.nextInt(256) & 0xff).toByte)
      val payload = MultimodalOps.bmpHeaderFor(8, 4) ++ px
      val out = MultimodalOps.decodeBmp(payload)
      assert(out.length == px.length)
      var i = 0
      while (i < out.length) {
        assert(Math.round(out(i) * 255.0).toInt == (px(i) & 0xff),
          s"pixel $i: ${out(i)} vs ${px(i) & 0xff}")
        i += 1
      }
    }
  }

  /** Reference WAV writer: canonical header, optional unknown chunk
    * (odd sizes exercise word-align padding) before `data`. */
  private def wavBytes(samples: Array[Int], junk: Option[Array[Byte]]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val junkPart = junk.map { j =>
      val pad = j.length & 1
      ("jnk ".getBytes("US-ASCII") ++ le(4).putInt(j.length).array()) ++ j ++
        Array.fill(pad)(0.toByte)
    }.getOrElse(Array.emptyByteArray)
    val riffSize = 4 + (8 + 16) + junkPart.length + (8 + dataBytes)
    val bb = le(12 + 8 + 16)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    val data = le(8 + dataBytes)
    data.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(s => data.putShort(s.toShort))
    bb.array() ++ junkPart ++ data.array()
  }

  test("wav: decode inverts encode for arbitrary samples, junk chunks skipped (200 seeds)") {
    val rng = new scala.util.Random(2002)
    for (i <- 1 to 200) {
      val n = 1 + rng.nextInt(64)
      val samples = Array.fill(n)(rng.nextInt(65536) - 32768)
      val junk =
        if (i % 2 == 0) Some(Array.fill(1 + rng.nextInt(9))(rng.nextInt(256).toByte))
        else None
      val (sr, ch, bits, out) = AudioOps.decodeWav(wavBytes(samples, junk))
      assert(sr == 8000 && ch == 1 && bits == 16)
      assert(out.toSeq == samples.toSeq)
    }
  }

  test("wav: corrupt chunk sizes are rejected cleanly (no overscan, no infinite loop)") {
    val base = wavBytes(Array(1, -2, 3, -4), None)
    // oversized data chunk: reads past buffer without the guard
    val over = base.clone()
    le(4).array() // noop, keep style
    ByteBuffer.wrap(over).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 8 + 16 + 4, Int.MaxValue - 7)
    intercept[IllegalArgumentException] { AudioOps.decodeWav(over) }
    // negative size: position update becomes a no-op without the guard
    val neg = base.clone()
    ByteBuffer.wrap(neg).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 8 + 16 + 4, -12)
    intercept[IllegalArgumentException] { AudioOps.decodeWav(neg) }
    intercept[IllegalArgumentException] {
      AudioOps.decodeWav("RIFFxxxxAVI ".getBytes("US-ASCII"))
    }
  }

  /** Reference AVI writer: RIFF('AVI ') → LIST(hdrl){avih} → optional
    * JUNK → LIST(movi){00db frames, arbitrary (odd allowed) sizes}. */
  private def aviBytes(usPerFrame: Int, w: Int, h: Int,
                       frames: Seq[Array[Byte]], junkLen: Int): Array[Byte] = {
    val hdrl = le(8 + 4 + 8 + 56)
    val hdrlSize = 4 + 8 + 56
    hdrl.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize)
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    val junk =
      if (junkLen == 0) Array.emptyByteArray
      else ("JUNK".getBytes("US-ASCII") ++ le(4).putInt(junkLen).array()
        ++ Array.fill(junkLen + (junkLen & 1))(0.toByte))
    val movi = frames.flatMap { f =>
      "00db".getBytes("US-ASCII") ++ le(4).putInt(f.length).array() ++ f ++
        Array.fill(f.length & 1)(0.toByte)
    }.toArray
    val moviSize = 4 + movi.length
    val riffSize = 4 + (8 + hdrlSize) + junk.length + (8 + moviSize)
    val head = le(12)
    head.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("AVI ".getBytes("US-ASCII"))
    head.array() ++ hdrl.array() ++ junk ++
      ("LIST".getBytes("US-ASCII") ++ le(4).putInt(moviSize).array() ++
        "movi".getBytes("US-ASCII")) ++ movi
  }

  test("avi: header fields and frames round-trip for arbitrary shapes (200 seeds)") {
    val rng = new scala.util.Random(3003)
    for (i <- 1 to 200) {
      val nf = 1 + rng.nextInt(6)
      val frames = Seq.fill(nf)(
        Array.fill(1 + rng.nextInt(40))(rng.nextInt(256).toByte)) // odd sizes included
      val us = 1 + rng.nextInt(1000000)
      val w = 1 + rng.nextInt(64); val h = 1 + rng.nextInt(64)
      val junkLen = if (i % 3 == 0) 1 + rng.nextInt(7) else 0
      val (gotUs, total, gw, gh, got) = VideoOps.decodeAvi(aviBytes(us, w, h, frames, junkLen))
      assert(gotUs == us && total == nf && gw == w && gh == h)
      assert(got.length == nf)
      got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("avi: corrupt LIST size rejected; unknown top-level LIST skipped whole") {
    val frames = Seq(Array[Byte](1, 2, 3, 4))
    val good = aviBytes(1000, 4, 2, frames, junkLen = 4)
    val bad = good.clone()
    // corrupt the movi LIST size (it is the last LIST header in the file)
    val moviHdr = good.length - (8 + 4 + 8 + 4) // LIST hdr + 'movi' + chunk hdr + frame
    ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN).putInt(moviHdr + 4, Int.MaxValue - 3)
    intercept[IllegalArgumentException] { VideoOps.decodeAvi(bad) }
    // an unknown LIST between hdrl and movi must be skipped whole
    val unknownList = "LIST".getBytes("US-ASCII") ++
      le(4).putInt(8).array() ++ "wxyz".getBytes("US-ASCII") ++ Array[Byte](9, 9, 9, 9)
    val riffHdr = 12
    val hdrlLen = 8 + 4 + 8 + 56
    val pre = good.slice(0, riffHdr + hdrlLen)
    val post = good.slice(riffHdr + hdrlLen, good.length)
    val spliced = pre ++ unknownList ++ post
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, ByteBuffer.wrap(good).order(ByteOrder.LITTLE_ENDIAN).getInt(4) + unknownList.length)
    val (_, _, _, _, got) = VideoOps.decodeAvi(spliced)
    assert(got.length == 1 && got.head.sameElements(frames.head))
  }
}
