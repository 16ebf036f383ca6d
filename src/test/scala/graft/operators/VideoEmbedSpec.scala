package graft.operators

import graft.SparkSpec

/** Frame → embedding pathway (SURVEY.md §2.7 E4): per-slot normalization
  * properties of the concatenated color-layout descriptor, the fixture's
  * measured cosine margins around [[VideoEmbed.CosThreshold]] (the
  * measurements that previously lived in the deleted dev harness
  * Scratch.scala, now asserted), and the `video_embed` / `video_ann`
  * keys' planted-twin recovery through the shared vector stack and the
  * persisted IVFADC serving path. */
class VideoEmbedSpec extends SparkSpec {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  test("videoEmbed: deterministic, per-slot L2-normalized, partial decode → None") {
    val p = VideoEmbed.videoEmbed(VideoPhash.baseVideo(7L))
    assert(p.isDefined)
    val v = p.get
    assert(v.length === VideoEmbed.Dim)
    assert(p.get.toSeq === VideoEmbed.videoEmbed(VideoPhash.baseVideo(7L)).get.toSeq,
      "deterministic")
    // each slot block carries unit L2 norm (the mean-of-slot-cosines
    // property rests on this)
    for (j <- 0 until VideoPhash.Slots) {
      var n2 = 0.0
      for (k <- 0 until ImageEmbed.NCoef) {
        val x = v(j * ImageEmbed.NCoef + k); n2 += x * x
      }
      assert(math.abs(n2 - 1.0) < 1e-9, s"slot $j L2 norm")
    }
    // a truncated container (no decodable frames) must yield None, and a
    // non-video payload must too — the mixed-corpus safety contract
    assert(VideoEmbed.videoEmbed(VideoPhash.baseVideo(7L).take(64)).isEmpty)
    assert(VideoEmbed.videoEmbed("not a video".getBytes).isEmpty)
  }

  test("fixture margins: planted twins vs distinct videos straddle the threshold") {
    // the gate's geometry, measured (the AudioEmbedSpec discipline, ex-
    // Scratch.scala): every twin family's min cosine sits above the floor
    // with margin; the max over distinct-base pairs sits below with margin.
    val bases = (0L until VideoPhash.NBaseVideo.toLong).map(i =>
      VideoEmbed.videoEmbed(VideoPhash.baseVideo(i)).get)
    def twinMin(mk: Long => Array[Byte], range: Range): Double =
      range.map(i => cos(bases(i), VideoEmbed.videoEmbed(mk(i.toLong)).get)).min
    val rq = twinMin(VideoPhash.requalTwin, 0 until 50)
    val fps = twinMin(VideoPhash.fpsTwin, 50 until 100)
    val br = twinMin(VideoPhash.brightTwin, 100 until 150)
    val mp4 = twinMin(VideoPhash.mp4Twin, 150 until 200)
    var maxDistinct = -1.0
    for (i <- bases.indices; j <- (i + 1) until bases.length)
      maxDistinct = math.max(maxDistinct, cos(bases(i), bases(j)))
    val minTwin = Seq(rq, fps, br, mp4).min
    info(f"twin min cosines: requal $rq%.5f, fps $fps%.5f, bright $br%.5f, " +
      f"mp4 $mp4%.5f; max distinct-video cosine $maxDistinct%.5f; " +
      f"threshold ${VideoEmbed.CosThreshold}")
    assert(minTwin > VideoEmbed.CosThreshold + 0.005,
      f"twin margin too thin: $minTwin%.5f")
    assert(maxDistinct < VideoEmbed.CosThreshold - 0.005,
      f"distinct-video margin too thin: $maxDistinct%.5f")
  }

  test("video_embed recovers exactly the planted twins from bytes alone") {
    VideoPhash.ensureVideoPhashFixture(spark)
    val out = VideoEmbed.videoEmbedQuery(spark, "unused").collect()
    assert(out.length === VideoPhash.NBaseVideo + 200)
    out.foreach { r =>
      val id = r.getLong(0)
      val dupOf = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val keep = r.getBoolean(2)
      if (id >= VideoPhash.VideoMp4Offset)
        assert(dupOf === Some(id - VideoPhash.VideoMp4Offset) && !keep,
          s"mp4 twin $id")
      else if (id >= VideoPhash.VideoBrightOffset)
        assert(dupOf === Some(id - VideoPhash.VideoBrightOffset) && !keep,
          s"bright twin $id")
      else if (id >= VideoPhash.VideoFpsOffset)
        assert(dupOf === Some(id - VideoPhash.VideoFpsOffset) && !keep,
          s"fps twin $id")
      else if (id >= VideoPhash.VideoRequalOffset)
        assert(dupOf === Some(id - VideoPhash.VideoRequalOffset) && !keep,
          s"requal twin $id")
      else
        assert(dupOf === None && keep, s"base video $id must not collide")
    }
  }

  test("video_ann serves every twin's base as top-1 from the persisted index, repeat-call bit-identical") {
    VideoPhash.ensureVideoPhashFixture(spark)
    val first = VideoEmbed.videoAnnQuery(spark, "unused").collect()
    assert(first.length === 200, "one row per planted twin")
    first.foreach { r =>
      val id = r.getLong(0)
      val base =
        if (id >= VideoPhash.VideoMp4Offset) id - VideoPhash.VideoMp4Offset
        else if (id >= VideoPhash.VideoBrightOffset) id - VideoPhash.VideoBrightOffset
        else if (id >= VideoPhash.VideoFpsOffset) id - VideoPhash.VideoFpsOffset
        else id - VideoPhash.VideoRequalOffset
      assert(r.getLong(1) === base, s"twin $id must find its base as top-1")
    }
    // second call must SERVE from the persisted artifact (no retrain:
    // the index files' mtimes are untouched) and return identical rows
    val idxFile = new java.io.File(
      s"${VideoEmbed.videoAnnIndexPath}/assigned/_SUCCESS")
    assert(idxFile.exists)
    val mtime = idxFile.lastModified()
    val second = VideoEmbed.videoAnnQuery(spark, "unused").collect()
    assert(idxFile.lastModified() === mtime, "second call must not rebuild")
    assert(second.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      first.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
