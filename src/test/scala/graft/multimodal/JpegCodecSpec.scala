package graft.multimodal

import graft.SparkSpec

class JpegCodecSpec extends SparkSpec {

  private def constRaster(vals: Int*): Array[Byte] =
    JpegCodec.constantRaster(vals.toArray)

  test("jpeg exact roundtrip on even constant blocks (the fixture's lossless subset)") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val blocks = Array.fill(4)(rnd.nextInt(256) & 0xfe)
      val raster = JpegCodec.constantRaster(blocks)
      val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(raster))
      assert(dec.toSeq == raster.toSeq, s"seed $seed: lossless subset must roundtrip exactly")
    }
  }

  test("hand decode == imageio byte-for-byte on AC-rich random images (jidctint parity)") {
    // random rasters push real AC coefficients through the full Huffman
    // + dequant + IDCT path; agreement with the JDK's bundled IJG
    // decoder certifies the fixed-point IDCT replication on arbitrary
    // content, not just the fixture's flat blocks
    for (seed <- 1 to 24) {
      val rnd = new scala.util.Random(seed * 7)
      val raster = Array.fill(JpegCodec.RasterBytes)(rnd.nextInt(256).toByte)
      val payload = JpegCodec.encodeJpeg(raster)
      val hand = JpegCodec.decodeJpeg(payload)
      val indep = JpegCodec.decodeWithImageIO(payload)
      assert(hand.toSeq == indep.toSeq, s"seed $seed: IDCT parity broke")
    }
    // structured content too: gradients + step edges (large low-freq AC)
    val grad = Array.tabulate(JpegCodec.RasterBytes)(i => ((i * 7) % 256).toByte)
    val pg = JpegCodec.encodeJpeg(grad)
    assert(JpegCodec.decodeJpeg(pg).toSeq == JpegCodec.decodeWithImageIO(pg).toSeq)
  }

  test("jpeg decode quality: random-content reconstruction stays near the source") {
    val rnd = new scala.util.Random(99)
    // smooth content (what quant tables are designed for): small error
    val smooth = Array.tabulate(JpegCodec.RasterBytes) { i =>
      val x = i % JpegCodec.W; val y = i / JpegCodec.W
      (96 + 4 * x + 3 * y + rnd.nextInt(3)).toByte
    }
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(smooth))
    val maxErr = smooth.zip(dec).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 24, s"smooth-content max error $maxErr out of the quantizer's class")
  }

  test("jpeg rejects corruption loudly: truncation, marker damage, bad Huffman stream") {
    val payload = JpegCodec.encodeJpeg(constRaster(10, 60, 110, 160))
    intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(payload, payload.length / 2)))
    val badSoi = payload.clone(); badSoi(1) = 0x00
    intercept[IllegalArgumentException](JpegCodec.decodeJpeg(badSoi))
    val badSof = payload.clone()
    // SOF0 marker (0xc0) -> progressive (0xc2) must be rejected, not misread
    val sofAt = (0 until payload.length - 1)
      .find(i => (payload(i) & 0xff) == 0xff && (payload(i + 1) & 0xff) == 0xc0).get
    badSof(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](JpegCodec.decodeJpeg(badSof))
  }

  test("mm10 query: both decoders agree and features match the chain on sf0.001") {
    val out = JpegCodec.query(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getAs[Long]("n_px") == JpegCodec.RasterBytes.toLong)
      val mn = r.getAs[Long]("min_px"); val mx = r.getAs[Long]("max_px")
      assert(mn % 2 == 0 && mx % 2 == 0, "fixture blocks are even-valued")
      assert(mn >= 0 && mx <= 254 && mn <= mx)
    }
  }
}
