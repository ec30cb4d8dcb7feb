package graft.multimodal

import graft.SparkSpec

class PngCodecSpec extends SparkSpec {

  private def raster(seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(PngCodec.RasterBytes)(rnd.nextInt(256).toByte)
  }

  test("png roundtrip: decode(encode(raster)) == raster for every filter phase, and imageio agrees") {
    for (f0 <- 0 to 4; seed <- 1 to 8) {
      val px = raster(seed * 31 + f0)
      val png = PngCodec.encodePng(px, f0)
      val dec = PngCodec.decodePng(png)
      assert(dec.toSeq == px.toSeq, s"hand decode mismatch at f0=$f0 seed=$seed")
      val indep = PngCodec.decodeWithImageIO(png)
      assert(indep.toSeq == px.toSeq, s"imageio mismatch at f0=$f0 seed=$seed")
    }
    // the five phases exercise ALL five filter types across rows 0..3
  }

  test("png rejects a flipped IDAT byte (CRC catches it before any decode)") {
    val png = PngCodec.encodePng(raster(7), 1)
    // IDAT data starts after signature(8) + IHDR chunk(8+13+4) + IDAT header(8)
    val idatData = 8 + 25 + 8
    val bad = png.clone(); bad(idatData + 3) = (bad(idatData + 3) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decodePng(bad))
    assert(e.getMessage.contains("CRC mismatch in IDAT"))
  }

  test("png rejects corruption even when the CRC is fixed up (the zlib stream itself fails)") {
    val png = PngCodec.encodePng(raster(9), 2)
    val idatStart = 8 + 25 // chunk header offset of IDAT
    val len = ((png(idatStart) & 0xff) << 24) | ((png(idatStart + 1) & 0xff) << 16) |
              ((png(idatStart + 2) & 0xff) << 8) | (png(idatStart + 3) & 0xff)
    val bad = png.clone()
    // corrupt a zlib byte mid-stream, then recompute the chunk CRC so the
    // walk passes and the Inflater has to catch it
    bad(idatStart + 8 + len / 2) = (bad(idatStart + 8 + len / 2) ^ 0x55).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(bad, idatStart + 4, 4 + len)
    val v = crc.getValue
    bad(idatStart + 8 + len) = ((v >> 24) & 0xff).toByte
    bad(idatStart + 9 + len) = ((v >> 16) & 0xff).toByte
    bad(idatStart + 10 + len) = ((v >> 8) & 0xff).toByte
    bad(idatStart + 11 + len) = (v & 0xff).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decodePng(bad))
    assert(e.getMessage.contains("zlib") || e.getMessage.contains("filter"),
      s"expected a stream/filter failure, got: ${e.getMessage}")
  }

  test("png rejects truncation, bad signature, and a flipped IHDR byte") {
    val png = PngCodec.encodePng(raster(11), 3)
    intercept[IllegalArgumentException](
      PngCodec.decodePng(java.util.Arrays.copyOf(png, png.length - 6)))
    val badSig = png.clone(); badSig(0) = 'X'.toByte
    intercept[IllegalArgumentException](PngCodec.decodePng(badSig))
    val badIhdr = png.clone(); badIhdr(8 + 8 + 2) = 99.toByte // width byte
    val e = intercept[IllegalArgumentException](PngCodec.decodePng(badIhdr))
    assert(e.getMessage.contains("CRC mismatch in IHDR"))
  }

  test("png rejects a negative (top-bit-set) chunk length via the documented contract") {
    val png = PngCodec.encodePng(raster(13), 0)
    val idatStart = 8 + 25 // chunk header offset of IDAT
    val bad = png.clone()
    bad(idatStart) = (bad(idatStart) | 0x80).toByte // length >= 2^31 → negative int
    val e = intercept[IllegalArgumentException](PngCodec.decodePng(bad))
    assert(e.getMessage.contains("bad chunk length"),
      s"expected the loud length contract, got: ${e.getMessage}")
  }

  test("mm9 generation is shuffle-free and the query matches the generated chain on sf0.001") {
    val media = PngCodec.pngFromDocuments(spark, "/root/testdata/sf0.001")
    val phys = media.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"generation must be narrow:\n$phys")
    val rows = PngCodec.query(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Int]("n_px") == PngCodec.RasterBytes))
  }
}
