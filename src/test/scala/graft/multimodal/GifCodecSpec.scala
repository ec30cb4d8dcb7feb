package graft.multimodal

import graft.SparkSpec

class GifCodecSpec extends SparkSpec {

  test("gif roundtrip: decode(encode(raster)) == raster and imageio agrees") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(GifCodec.RasterBytes)(rnd.nextInt(256).toByte)
      val gif = GifCodec.encodeGif(px)
      assert(GifCodec.decodeGif(gif).toSeq == px.toSeq, s"hand decode, seed $seed")
      assert(GifCodec.decodeWithImageIO(gif).toSeq == px.toSeq, s"imageio, seed $seed")
    }
    // repetitive content (LZW's best case) and constant content
    val rep = Array.tabulate(GifCodec.RasterBytes)(i => (i % 4).toByte)
    val gr = GifCodec.encodeGif(rep)
    assert(GifCodec.decodeGif(gr).toSeq == rep.toSeq)
    assert(GifCodec.decodeWithImageIO(gr).toSeq == rep.toSeq)
  }

  test("raw LZW fuzz: width-boundary crossings, KwKwK, and dictionary-overflow clears") {
    // sizes chosen to park the dictionary right on the 512/1024/2048
    // boundaries and far past 4096 (forcing mid-stream clear codes)
    for (n <- Seq(1, 2, 3, 300, 700, 1500, 3000, 6000, 9000, 20000); seed <- 1 to 3) {
      val rnd = new scala.util.Random(n * 31 + seed)
      // small alphabet maximizes dictionary growth + KwKwK patterns
      val data = Array.fill(n)((rnd.nextInt(4)).toByte)
      val dec = GifCodec.lzwDecode(GifCodec.lzwEncode(data), n)
      assert(dec.toSeq == data.toSeq, s"lzw roundtrip broke at n=$n seed=$seed")
    }
    // aaaa... is the canonical KwKwK generator
    val kw = Array.fill(500)(7.toByte)
    assert(GifCodec.lzwDecode(GifCodec.lzwEncode(kw), 500).toSeq == kw.toSeq)
  }

  test("overflow-sized image content roundtrips through imageio as well") {
    // a raster-sized slice of a low-alphabet stream still exercises the
    // framing + container; imageio is the independent witness
    val rnd = new scala.util.Random(5)
    val px = Array.fill(GifCodec.RasterBytes)((rnd.nextInt(3) * 100).toByte)
    val gif = GifCodec.encodeGif(px)
    assert(GifCodec.decodeGif(gif).toSeq == GifCodec.decodeWithImageIO(gif).toSeq)
  }

  test("gif rejects corruption loudly: signature, truncation, framing, palette") {
    val px = Array.tabulate(GifCodec.RasterBytes)(i => i.toByte)
    val gif = GifCodec.encodeGif(px)
    val badSig = gif.clone(); badSig(4) = '9'.toByte
    intercept[IllegalArgumentException](GifCodec.decodeGif(badSig))
    intercept[IllegalArgumentException](
      GifCodec.decodeGif(java.util.Arrays.copyOf(gif, gif.length - 10)))
    val badPal = gif.clone(); badPal(13 + 3 * 40) = 99.toByte // palette entry 40 ruined
    intercept[IllegalArgumentException](GifCodec.decodeGif(badPal))
    // sub-block length byte inflated past the payload end
    val lzwStart = 13 + 768 + 10 + 1
    val badFrame = gif.clone(); badFrame(lzwStart) = 0xff.toByte
    intercept[IllegalArgumentException](GifCodec.decodeGif(badFrame))
  }

  test("mm11 query: both decoders agree and the chain features hold on sf0.001") {
    val out = GifCodec.query(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getAs[Long]("n_px") == GifCodec.RasterBytes.toLong)
      assert(r.getAs[Long]("min_px") <= r.getAs[Long]("max_px"))
    }
  }
}
