package graft.operators

import graft.SparkSpec

/** Sample → embedding pathway (SURVEY.md §2.7 E4): the log-spectral band
  * profile's analytic invariances (gain/resample are uniform log shifts,
  * removed by centering), the fixture's measured margins around
  * [[AudioEmbed.CosThreshold]], and the `audio_embed` / `audio_ann`
  * keys' planted-twin recovery through the shared vector stack and the
  * persisted IVFADC serving path. */
class AudioEmbedSpec extends SparkSpec {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  private def profile(rate: Int, s: Array[Short]): Array[Double] =
    AudioEmbed.bandProfile(rate, s)

  test("bandProfile: mean-centered, deterministic, gain- and rate-invariant analytically") {
    val s = AudioPhash.gridCodeSamples(11L)
    val p = profile(AudioPhash.SampleRate, s)
    assert(p.length === AudioEmbed.Dim)
    assert(p.toSeq === profile(AudioPhash.SampleRate, s).toSeq, "deterministic")
    assert(math.abs(p.sum) < 1e-9, "centered: coordinates sum to zero")
    // gain shifts every log energy by the same constant → centered
    // profiles are equal up to float noise (cosine ≈ 1, not merely high)
    val gained = profile(AudioPhash.SampleRate, AudioPhash.scaleTwin(s))
    assert(cos(p, gained) > 0.999999, "gain is a pure DC shift in log domain")
    // decimation-by-2 halves every segment length uniformly (bands are
    // bin-aligned at both rates) → another uniform shift, centered out
    val half = profile(AudioPhash.SampleRate / 2, AudioPhash.resampleTwin(s))
    assert(cos(p, half) > 0.999999, "alias-free decimation is a uniform shift")
  }

  test("fixture margins: planted twins vs distinct clips straddle the threshold") {
    // the gate's geometry, measured (the ImageEmbedSpec discipline): every
    // planted pair verifies above CosThreshold with margin; every
    // distinct-clip pair falls below it with margin. Sampled bases keep
    // the O(n²) distinct scan cheap; the declared key covers all 400.
    val bases = (0L until 100L).map(i =>
      profile(AudioPhash.SampleRate, AudioPhash.gridCodeSamples(i)))
    var minTwin = 1.0
    for (i <- 0L until 50L) {
      val dithered = profile(AudioPhash.SampleRate,
        AudioPhash.ditherTwin(i, AudioPhash.gridCodeSamples(i)))
      minTwin = math.min(minTwin, cos(bases(i.toInt), dithered))
    }
    var maxDistinct = -1.0
    for (i <- bases.indices; j <- (i + 1) until bases.length)
      maxDistinct = math.max(maxDistinct, cos(bases(i), bases(j)))
    info(f"min planted-twin cosine $minTwin%.5f; max distinct-clip cosine $maxDistinct%.5f; threshold ${AudioEmbed.CosThreshold}")
    assert(minTwin > AudioEmbed.CosThreshold + 0.005,
      f"twin margin too thin: $minTwin%.5f")
    assert(maxDistinct < AudioEmbed.CosThreshold - 0.005,
      f"distinct-clip margin too thin: $maxDistinct%.5f")
  }

  test("audio_embed recovers exactly the planted twins from bytes alone") {
    AudioPhash.ensureAudioPhashFixture(spark)
    val out = AudioEmbed.audioEmbedQuery(spark, "unused").collect()
    assert(out.length === AudioPhash.NBaseAudio + 300)
    out.foreach { r =>
      val id = r.getLong(0)
      val dupOf = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val keep = r.getBoolean(2)
      if (id >= AudioPhash.AudioResampleOffset)
        assert(dupOf === Some(id - AudioPhash.AudioResampleOffset) && !keep,
          s"resample twin $id")
      else if (id >= AudioPhash.AudioDitherOffset)
        assert(dupOf === Some(id - AudioPhash.AudioDitherOffset) && !keep,
          s"dither twin $id")
      else if (id >= AudioPhash.AudioScaleOffset)
        assert(dupOf === Some(id - AudioPhash.AudioScaleOffset) && !keep,
          s"gain twin $id")
      else
        assert(dupOf === None && keep, s"base clip $id must not collide")
    }
  }

  test("audio_ann serves every twin's base as top-1 from the persisted index, repeat-call bit-identical") {
    AudioPhash.ensureAudioPhashFixture(spark)
    val first = AudioEmbed.audioAnnQuery(spark, "unused").collect()
    assert(first.length === 300, "one row per planted twin")
    first.foreach { r =>
      val id = r.getLong(0)
      val base =
        if (id >= AudioPhash.AudioResampleOffset) id - AudioPhash.AudioResampleOffset
        else if (id >= AudioPhash.AudioDitherOffset) id - AudioPhash.AudioDitherOffset
        else id - AudioPhash.AudioScaleOffset
      assert(r.getLong(1) === base, s"twin $id must find its base as top-1")
    }
    // second call must SERVE from the persisted artifact (no retrain:
    // the index files' mtimes are untouched) and return identical rows
    val idxFile = new java.io.File(
      s"${AudioEmbed.audioAnnIndexPath}/assigned/_SUCCESS")
    assert(idxFile.exists)
    val mtime = idxFile.lastModified()
    val second = AudioEmbed.audioAnnQuery(spark, "unused").collect()
    assert(idxFile.lastModified() === mtime, "second call must not rebuild")
    assert(second.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      first.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
