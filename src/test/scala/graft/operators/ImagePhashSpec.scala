package graft.operators

import graft.SparkSpec
import ImagePhash.{Png, dHash}

/** Content-level image near-dup (SURVEY.md §2.7 E4): the pure-JVM PNG
  * codec, the dHash fingerprint, and the banded-Hamming dedup over the
  * planted fixture. */
class ImagePhashSpec extends SparkSpec {

  private def pixels(seed: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    var s = seed
    var i = 0
    while (i < px.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      px(i) = (s >>> 33).toByte
      i += 1
    }
    px
  }

  test("png: encode→decode round-trips pixels exactly for every filter type") {
    val (w, h) = (37, 23) // odd dims: box bounds and left/up edges all hit
    val px = pixels(7L, w, h)
    for (f <- 0 to 4) {
      val bytes = Png.encode(w, h, px, filterFor = _ => f)
      val Some((dw, dh, dpx)) = Png.decodePixels(bytes)
      assert((dw, dh) === ((w, h)), s"filter $f dims")
      assert(dpx.toSeq === px.toSeq, s"filter $f pixels")
    }
    // mixed filters per scanline (the fixture's shape)
    val mixed = Png.encode(w, h, px, filterFor = r => r % 5)
    assert(Png.decodePixels(mixed).get._3.toSeq === px.toSeq)
  }

  test("png: re-encoding choices change bytes but never pixels or hash") {
    val (w, h) = (48, 32)
    val px = pixels(42L, w, h)
    val a = Png.encode(w, h, px, filterFor = r => r % 5, level = 6)
    val b = Png.encode(w, h, px, filterFor = r => (r * 2 + 1) % 5, level = 9,
      idatChunk = 256)
    assert(!a.sameElements(b), "different encodings must differ at byte level")
    val Some((_, _, pa)) = Png.decodePixels(a)
    val Some((_, _, pb)) = Png.decodePixels(b)
    assert(pa.toSeq === pb.toSeq)
    assert(dHash(w, h, pa) === dHash(w, h, pb))
  }

  test("png: grayscale (color type 0) decodes and expands to RGB") {
    // hand-build a 2x2 grayscale PNG through the encoder's chunk layer by
    // re-encoding: encode RGB where r=g=b, then also verify the dedicated
    // gray path via a manually assembled stream
    val (w, h) = (5, 4)
    val gray = Array.tabulate[Byte](w * h)(i => (i * 17).toByte)
    // assemble: signature + IHDR(colorType 0) + IDAT(raw filter-0 rows) + IEND
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) { raw.write(0); raw.write(gray, y * w, w) }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val zb = new Array[Byte](1024)
    val zn = defl.deflate(zb); defl.end()
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32; crc.update(t); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zb.take(zn)) ++ chunk("IEND", Array.emptyByteArray)
    val Some((dw, dh, rgb)) = Png.decodePixels(png)
    assert((dw, dh) === ((w, h)))
    for (i <- 0 until w * h) {
      assert(rgb(3 * i) === gray(i) && rgb(3 * i + 1) === gray(i) &&
        rgb(3 * i + 2) === gray(i))
    }
  }

  test("png: decode rejects junk, truncation, and unsupported formats — never throws") {
    val good = Png.encode(16, 16, pixels(1L, 16, 16))
    assert(Png.decodePixels(Array.empty[Byte]) === None)
    assert(Png.decodePixels(Array.fill[Byte](64)(0x41)) === None)
    assert(Png.decodePixels(good.take(20)) === None, "truncated mid-IHDR")
    assert(Png.decodePixels(good.dropRight(30)) === None, "truncated IDAT")
    // 16-bit depth rejected
    val deep = good.clone(); deep(24) = 16.toByte
    assert(Png.decodePixels(deep) === None)
    // header-only payload from the media_dims fixture family (no IDAT)
    assert(Png.decodePixels(
      Multimodal.MediaDecoder.pngHeader(10, 10) ++ Array.fill[Byte](40)(3)) === None)
  }

  test("dhash: small perturbations stay within the banded-LSH radius") {
    val (w, h) = (48, 32)
    for (seed <- 0L until 50L) {
      val px = pixels(seed, w, h)
      val p2 = px.clone()
      var k = 0
      while (k < 6) {
        val idx = (((seed * 31 + k * 97) % (w.toLong * h)) * 3).toInt
        val v = (p2(idx) & 0xff) + 2
        p2(idx) = (if (v > 255) 255 else v).toByte
        k += 1
      }
      val d = java.lang.Long.bitCount(dHash(w, h, px) ^ dHash(w, h, p2))
      assert(d <= ImagePhash.HammingMax, s"seed $seed perturbed hamming $d")
    }
  }

  test("phash dedup recovers exactly the planted twins from bytes alone") {
    ImagePhash.ensurePhashFixture(spark)
    val out = ImagePhash.mediaPhashQuery(spark, "unused").collect()
    assert(out.length ===
      ImagePhash.NBase + ImagePhash.NExact + ImagePhash.NNear)
    out.foreach { r =>
      val id = r.getLong(0)
      val dupOf = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val keep = r.getBoolean(2)
      if (id >= ImagePhash.NearOffset) {
        assert(dupOf === Some(id - ImagePhash.NearOffset) && !keep,
          s"near twin $id")
      } else if (id >= ImagePhash.ExactOffset) {
        assert(dupOf === Some(id - ImagePhash.ExactOffset) && !keep,
          s"exact twin $id")
      } else {
        assert(dupOf === None && keep, s"base image $id must not collide")
      }
    }
  }
}
