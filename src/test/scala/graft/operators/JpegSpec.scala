package graft.operators

import graft.SparkSpec
import ImagePhash.{Png, dHash}

/** Baseline JPEG codec + the lossy/cross-format half of the image
  * near-dup modality (SURVEY.md §2.7 E4): encode→decode fidelity within
  * quantization error, restart markers, the grayscale 1-component path,
  * structural rejection, magic-byte dispatch, and the planted-twin
  * recovery of the `media_phash_jpeg` key. */
class JpegSpec extends SparkSpec {

  private def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    var se = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); se += d * d; i += 1 }
    10 * math.log10(255.0 * 255.0 / (se / a.length))
  }

  test("jpeg: encode→decode reproduces pixels within quantization error") {
    for (id <- 0L until 20L) {
      val (w, h, px) = ImagePhash.smoothPixels(id)
      val Some((dw, dh, dpx)) = Jpeg.decodePixels(Jpeg.encode(w, h, px, quality = 90))
      assert((dw, dh) === ((w, h)))
      val p = psnr(px, dpx)
      assert(p > 30, s"id $id PSNR $p dB too low for q=90")
    }
    // odd, non-multiple-of-8 dims: edge replication + crop path
    val (w, h) = (37, 23)
    val px = ImagePhash.smoothPixels(5L)._3.take(w * h * 3)
    val Some((dw, dh, dpx)) = Jpeg.decodePixels(Jpeg.encode(w, h, px, quality = 90))
    assert((dw, dh) === ((w, h)))
    assert(psnr(px, dpx) > 25)
  }

  test("jpeg: quality trades bytes for error monotonically") {
    val (w, h, px) = ImagePhash.smoothPixels(3L)
    val qs = Seq(95, 75, 50)
    val encoded = qs.map(q => Jpeg.encode(w, h, px, q))
    val errs = encoded.map(e => psnr(px, Jpeg.decodePixels(e).get._3))
    assert(errs === errs.sorted.reverse, s"PSNR should fall with quality: $errs")
    // lossy: re-encoding at a different quality changes bytes AND pixels
    assert(!encoded(0).sameElements(encoded(1)))
    assert(!Jpeg.decodePixels(encoded(0)).get._3.sameElements(
      Jpeg.decodePixels(encoded(1)).get._3))
  }

  test("jpeg: restart markers decode pixel-identically and reset prediction") {
    val (w, h, px) = ImagePhash.smoothPixels(11L)
    val plain = Jpeg.encode(w, h, px, quality = 90)
    val rst = Jpeg.encode(w, h, px, quality = 90, restartInterval = 2)
    assert(!plain.sameElements(rst), "DRI/RSTn must appear in the stream")
    // RSTn markers present in the entropy segment
    assert(rst.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7))
    val a = Jpeg.decodePixels(plain).get._3
    val b = Jpeg.decodePixels(rst).get._3
    assert(a.toSeq === b.toSeq)
  }

  test("jpeg: grayscale 1-component stream decodes and expands to RGB") {
    val (w, h, px) = ImagePhash.smoothPixels(17L)
    val gray = ImagePhash.lumaPlane(px)
    val Some((dw, dh, rgb)) = Jpeg.decodePixels(Jpeg.encodeGray(w, h, gray, quality = 92))
    assert((dw, dh) === ((w, h)))
    // channels equal (grayscale expansion), value near the source luma
    var maxErr = 0
    for (i <- 0 until w * h) {
      assert(rgb(3 * i) === rgb(3 * i + 1))
      assert(rgb(3 * i) === rgb(3 * i + 2))
      maxErr = math.max(maxErr, math.abs((rgb(3 * i) & 0xff) - (gray(i) & 0xff)))
    }
    assert(maxErr < 48, s"gray max error $maxErr") // within q=92 quantization
    assert(psnr(gray, Array.tabulate[Byte](w * h)(i => rgb(3 * i))) > 30)
  }

  test("jpeg: decode rejects junk, truncation, and out-of-scope processes — never throws") {
    val (w, h, px) = ImagePhash.smoothPixels(1L)
    val good = Jpeg.encode(w, h, px)
    assert(Jpeg.decodePixels(Array.empty[Byte]) === None)
    assert(Jpeg.decodePixels(Array.fill[Byte](64)(0x41)) === None)
    assert(Jpeg.decodePixels(good.take(40)) === None, "truncated in headers")
    assert(Jpeg.decodePixels(good.dropRight(good.length / 3)) === None,
      "truncated mid-scan")
    // progressive (SOF2) declared out of scope → None, not garbage pixels
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decodePixels(prog) === None)
    // header-only payload (media_dims fixture family: SOI+SOF, no scan)
    assert(Jpeg.decodePixels(
      Multimodal.MediaDecoder.jpegHeader(10, 10)) === None)
  }

  test("jpeg: high-contrast content at top quality encodes without coefficient overflow (r14 clamp)") {
    // checkerboard at maximum contrast: the DCT concentrates ±1016·8
    // into a few coefficients; at quality 98 the quant divisors are ~1,
    // so unclamped quantized values reach category 11 — which the
    // baseline AC tables don't cover (the pre-fix crash). The clamp
    // keeps them in [-1023, 1023]; the image still round-trips visually
    // (the clamp only touches pathological coefficients).
    val w = 64; val h = 64
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (((x ^ y) & 1) == 0) 0xff.toByte else 0x00.toByte
      val i = (y * w + x) * 3
      px(i) = v; px(i + 1) = v; px(i + 2) = v
    }
    for (q <- Seq(93, 98, 100)) {
      val enc = Jpeg.encode(w, h, px, quality = q) // must not throw
      val Some((dw, dh, _)) = Jpeg.decodePixels(enc)
      assert(dw === w && dh === h, s"quality $q round-trips")
    }
  }

  test("png/jpeg/wav/avi/mp4: crafted huge sizes are rejected in long arithmetic — never a throw (r14)") {
    // PNG: a syntactically valid IHDR whose dims overflow `h * (1 + 3w)`
    // into a negative array size pre-fix
    val (w, h, px) = ImagePhash.smoothPixels(2L)
    val png = ImagePhash.Png.encode(w, h, px)
    val bigDims = png.clone()
    def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v >> 24).toByte; b(i + 1) = (v >> 16).toByte
      b(i + 2) = (v >> 8).toByte; b(i + 3) = v.toByte
    }
    putBe32(bigDims, 16, 0x40000) // w = 262144
    putBe32(bigDims, 20, 0x40000) // h = 262144 → w*h*3 overflows int
    assert(ImagePhash.Png.decodePixels(bigDims) === None)
    // WAV: declared chunk length near Int.MaxValue wraps `i + 8 + len`
    // negative pre-fix, bypassing the bound
    val wav = Wav.encode(8000, Array.tabulate[Short](64)(_.toShort))
    val hugeChunk = wav.clone()
    hugeChunk(16) = 0xf8.toByte; hugeChunk(17) = 0xff.toByte
    hugeChunk(18) = 0xff.toByte; hugeChunk(19) = 0x7f.toByte // fmt len = 0x7ffffff8
    assert(Wav.decode(hugeChunk) === None)
    // AVI: same pattern on the top-level LIST size
    val avi = Avi.encode(40000, 32, 32, Array(Jpeg.encode(32, 32, new Array[Byte](32 * 32 * 3))))
    val hugeList = avi.clone()
    hugeList(16) = 0xf8.toByte; hugeList(17) = 0xff.toByte
    hugeList(18) = 0xff.toByte; hugeList(19) = 0x7f.toByte
    assert(Avi.decode(hugeList) === None)
    // MP4: a 64-bit largesize past the payload end
    val mp4 = Mp4.encode(40000, 32, 32, Array(Jpeg.encode(32, 32, new Array[Byte](32 * 32 * 3))))
    val hugeBox = mp4.clone()
    putBe32(hugeBox, 0, 1) // ftyp size → largesize marker with no largesize room
    assert(Mp4.decode(hugeBox) === None)
  }

  test("mp4: a largesize box shorter than its own 16-byte header is rejected (r15)") {
    // sz32 == 1 declares a 64-bit largesize; boxLen in [8,16) passes the
    // generic >= 8 check but puts bodyFrom (i+16) past the box end, handing
    // handlers an inverted (from > until) range — the walk must reject it.
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32((v >>> 32).toInt) ++ be32(v.toInt)
    val payload =
      be32(16) ++ "ftyp".getBytes("US-ASCII") ++ new Array[Byte](8) ++
        be32(1) ++ "moov".getBytes("US-ASCII") ++ be64(12L) ++ new Array[Byte](4)
    assert(Mp4.decode(payload) === None) // and never a throw
  }

  test("decodeImage dispatches on magic bytes across formats") {
    val (w, h, px) = ImagePhash.smoothPixels(9L)
    val png = Png.encode(w, h, px)
    val jpg = Jpeg.encode(w, h, px, quality = 90)
    val Some((pw, _, ppx)) = ImagePhash.decodeImage(png)
    val Some((jw, _, jpx)) = ImagePhash.decodeImage(jpg)
    assert(pw === w && jw === w)
    assert(ppx.toSeq === px.toSeq, "PNG path is lossless")
    // cross-format: same source through both codecs lands within the radius
    val d = java.lang.Long.bitCount(dHash(w, h, ppx) ^ dHash(w, h, jpx))
    assert(d <= ImagePhash.HammingMax, s"cross-format hamming $d")
    assert(ImagePhash.decodeImage("not an image".getBytes) === None)
  }

  test("gridCodePixels: dHash equals the splitmix64 code, stable under JPEG") {
    // The large-n probe generator: dHash ≡ a uniform 64-bit code by
    // construction (so 100k-scale separation follows from the birthday
    // bound instead of hoping smooth content doesn't collide), and the
    // ±GridStep cell margins survive real quantization at both probe
    // qualities.
    for (id <- 0L until 200L) {
      val (w, h, px) = ImagePhash.gridCodePixels(id)
      assert(dHash(w, h, px) === ImagePhash.splitmix64(id), s"raw render id $id")
      val q = if (id % 2 == 0) 90 else 70
      val Some((_, _, dpx)) = Jpeg.decodePixels(Jpeg.encode(w, h, px, quality = q))
      val d = java.lang.Long.bitCount(dHash(w, h, dpx) ^ ImagePhash.splitmix64(id))
      assert(d === 0, s"id $id q=$q flipped $d bits — quantization beat the margin")
    }
  }

  test("phash_jpeg dedup recovers exactly the planted twins from bytes alone") {
    ImagePhash.ensureJpegPhashFixture(spark)
    val out = ImagePhash.mediaPhashJpegQuery(spark, "unused").collect()
    assert(out.length === ImagePhash.NBaseJpeg + 300)
    out.foreach { r =>
      val id = r.getLong(0)
      val dupOf = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val keep = r.getBoolean(2)
      if (id >= ImagePhash.JpegGrayOffset)
        assert(dupOf === Some(id - ImagePhash.JpegGrayOffset) && !keep, s"gray twin $id")
      else if (id >= ImagePhash.JpegPngOffset)
        assert(dupOf === Some(id - ImagePhash.JpegPngOffset) && !keep, s"png twin $id")
      else if (id >= ImagePhash.JpegRequalOffset)
        assert(dupOf === Some(id - ImagePhash.JpegRequalOffset) && !keep, s"requal twin $id")
      else
        assert(dupOf === None && keep, s"base image $id must not collide")
    }
  }
}
