package graft.multimodal

import graft.SparkSpec

class AudioOpsSpec extends SparkSpec {

  private def wavFor(samples: Array[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeWav: parses header fields and recovers the exact int16 samples") {
    val s = Array[Short](0, 100, -100, 32767, -32768, 1, -1, 5000)
    val (sr, ch, bits, out) = AudioOps.decodeWav(wavFor(s))
    assert(sr == 8000 && ch == 1 && bits == 16)
    assert(out.toSeq == s.map(_.toInt).toSeq)
  }

  test("decodeWav: skips unknown chunks (LIST before data) like a compliant reader") {
    val s = Array[Short](7, -7, 7, -7)
    val plain = wavFor(s)
    // splice a LIST chunk of 6 bytes (odd→padded) between fmt and data
    val listChunk = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    listChunk.put("LIST".getBytes("US-ASCII")).putInt(6).put(Array[Byte](1,2,3,4,5,6))
    val spliced = plain.slice(0, 36) ++ listChunk.array() ++ plain.slice(36, plain.length)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (_, _, _, out) = AudioOps.decodeWav(spliced)
    assert(out.toSeq == s.map(_.toInt).toSeq)
  }

  test("decodeWav: rejects a non-RIFF payload") {
    intercept[IllegalArgumentException] {
      AudioOps.decodeWav(Array.fill[Byte](64)(0x42))
    }
  }

  test("frame features: integer energy / zero crossings / peak over a known clip") {
    import spark.implicits._
    // encoder side: run the real generated path over one in-memory doc table
    val mm = AudioOps.audioFeatures(spark, "/root/testdata/sf0.001")
      .limit(8).collect()
    assert(mm.nonEmpty)
    mm.foreach { r =>
      assert(r.getInt(2) == 8000)
      assert(r.getLong(3) >= 0L)                 // energy
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 7L)   // ≤ 7 sign changes per 8-frame
      assert(r.getLong(5) <= 32768L)             // peak bounded by int16
    }
  }

  test("generated payload really decodes: encoder ∘ decoder = sample generator") {
    import org.apache.spark.sql.functions._
    val one = AudioOps.audioFromDocuments(spark, "/root/testdata/sf0.001")
      .select(col("media_id"), col("payload")).limit(1).collect().head
    val payload = one.getAs[Array[Byte]]("payload")
    val (sr, ch, bits, smp) = AudioOps.decodeWav(payload)
    assert(sr == AudioOps.SampleRate && ch == 1 && bits == 16)
    assert(smp.length == AudioOps.NumSamples)
    // decoded samples must equal the little-endian int16 view of the
    // payload's data bytes (the generator's chained-md5 output)
    val bb = java.nio.ByteBuffer.wrap(payload, 44, AudioOps.NumSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val expect = Array.fill(AudioOps.NumSamples)(bb.getShort().toInt)
    assert(smp.toSeq == expect.toSeq)
  }
}
