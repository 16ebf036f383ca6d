package graft.operators

import graft.SparkSpec

/** Pixel → embedding pathway (SURVEY.md §2.7 E4): the luma color-layout
  * descriptor's invariances, the fixture's measured margins around
  * [[ImageEmbed.CosThreshold]], and the `media_embed` key's planted-twin
  * recovery through the vector stack. */
class ImageEmbedSpec extends SparkSpec {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  private def embedOf(payload: Array[Byte]): Array[Double] = {
    val Some((w, h, px)) = ImagePhash.decodeImage(payload)
    ImageEmbed.colorLayout(w, h, px)
  }

  test("colorLayout: luma-only, DC-free, deterministic") {
    val (w, h, px) = ImagePhash.smoothPixels(7L)
    val e1 = ImageEmbed.colorLayout(w, h, px)
    assert(e1.length === ImageEmbed.NCoef)
    assert(e1.toSeq === ImageEmbed.colorLayout(w, h, px).toSeq, "deterministic")
    // grayscale rendering of the same content (R=G=B=luma) must embed
    // almost identically — the descriptor reads only BT.601 luma
    val g = ImagePhash.lumaPlane(px)
    val rgbGray = new Array[Byte](px.length)
    var i = 0
    while (i < g.length) {
      rgbGray(3 * i) = g(i); rgbGray(3 * i + 1) = g(i); rgbGray(3 * i + 2) = g(i)
      i += 1
    }
    assert(cos(e1, ImageEmbed.colorLayout(w, h, rgbGray)) > 0.9999)
    // a globally brighter copy (pure DC shift — compress to [64,191]
    // first so +40 can't clip and bend the AC structure) embeds
    // identically to the unshifted compressed copy: DC excluded
    val mid = px.map(b => (64 + ((b & 0xff) >> 1)).toByte)
    val brighter = mid.map(b => ((b & 0xff) + 40).toByte)
    assert(cos(ImageEmbed.colorLayout(w, h, mid),
      ImageEmbed.colorLayout(w, h, brighter)) > 0.9999)
  }

  test("fixture margins: planted twins vs distinct bases straddle the threshold") {
    // the gate's geometry, measured: every planted pair must verify above
    // CosThreshold with margin; every distinct-base pair must fall below
    // it with margin (so the key can never be one quantization wobble
    // from flipping).
    val bases = (0L until ImagePhash.NBaseJpeg).map { id =>
      val (w, h, px) = ImagePhash.smoothPixels(id)
      id -> ImageEmbed.colorLayout(w, h, px)
    }
    var minTwin = 1.0
    for (i <- 0L until 100L) {
      val (w, h, px) = ImagePhash.smoothPixels(i)
      val re = embedOf(Jpeg.encode(w, h, px, quality = 70))
      minTwin = math.min(minTwin, cos(bases(i.toInt)._2, re))
    }
    for (i <- 200L until 300L) {
      val (w, h, px) = ImagePhash.smoothPixels(i)
      val gray = embedOf(Jpeg.encodeGray(w, h, ImagePhash.lumaPlane(px), quality = 85))
      minTwin = math.min(minTwin, cos(bases(i.toInt)._2, gray))
    }
    var maxDistinct = -1.0
    for (i <- bases.indices; j <- (i + 1) until bases.length) {
      maxDistinct = math.max(maxDistinct, cos(bases(i)._2, bases(j)._2))
    }
    info(f"min planted-twin cosine $minTwin%.5f; max distinct-base cosine $maxDistinct%.5f; threshold ${ImageEmbed.CosThreshold}")
    assert(minTwin > ImageEmbed.CosThreshold + 0.005,
      f"twin margin too thin: $minTwin%.5f")
    assert(maxDistinct < ImageEmbed.CosThreshold - 0.005,
      f"distinct-base margin too thin: $maxDistinct%.5f")
  }

  test("media_embed recovers exactly the planted twins from bytes alone") {
    ImagePhash.ensureJpegPhashFixture(spark)
    val out = ImageEmbed.mediaEmbedQuery(spark, "unused").collect()
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

  test("media_ann serves every twin's base as top-1 from the persisted index, repeat-call bit-identical") {
    ImagePhash.ensureJpegPhashFixture(spark)
    val first = ImageEmbed.mediaAnnQuery(spark, "unused").collect()
    assert(first.length === 300, "one row per planted twin")
    first.foreach { r =>
      val id = r.getLong(0)
      val base =
        if (id >= ImagePhash.JpegGrayOffset) id - ImagePhash.JpegGrayOffset
        else if (id >= ImagePhash.JpegPngOffset) id - ImagePhash.JpegPngOffset
        else id - ImagePhash.JpegRequalOffset
      assert(r.getLong(1) === base, s"twin $id must find its base as top-1")
    }
    // second call must SERVE from the persisted artifact (no retrain:
    // the index files' mtimes are untouched) and return identical rows
    val idxFile = new java.io.File(
      s"${ImageEmbed.mediaAnnIndexPath}/assigned/_SUCCESS")
    assert(idxFile.exists)
    val mtime = idxFile.lastModified()
    val second = ImageEmbed.mediaAnnQuery(spark, "unused").collect()
    assert(idxFile.lastModified() === mtime, "second call must not rebuild")
    assert(second.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      first.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
