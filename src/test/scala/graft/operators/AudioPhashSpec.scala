package graft.operators

import graft.SparkSpec

/** WAV codec + audio spectral fingerprint (SURVEY.md §2.7 E4): container
  * round-trip and structural rejection, fingerprint ≡ planted code,
  * invariance under the three planted degradations, and the
  * `audio_phash` key's end-to-end planted-twin recovery. */
class AudioPhashSpec extends SparkSpec {

  test("wav: encode→decode round-trips PCM exactly (lossless container)") {
    val samples = Array.tabulate[Short](1000)(i => (math.sin(i * 0.1) * 12000).toShort)
    val Some((rate, back)) = Wav.decode(Wav.encode(8000, samples))
    assert(rate === 8000)
    assert(back.toSeq === samples.toSeq)
  }

  test("wav: skips unknown chunks, downmixes stereo, rejects junk — never throws") {
    val samples = Array.tabulate[Short](100)(i => (i * 7).toShort)
    // splice a LIST chunk between fmt and data: a conformant reader skips it
    val canonical = Wav.encode(8000, samples)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOxy".getBytes("US-ASCII")
    val spliced = canonical.take(36) ++ listChunk ++ canonical.drop(36)
    // RIFF size field is now stale — real-world files have that too; the
    // chunk walk must not care
    val Some((_, back)) = Wav.decode(spliced)
    assert(back.toSeq === samples.toSeq, "LIST chunk skipped")
    // stereo: L and R average into the mono frame
    val stereo = {
      val b = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
        .putInt(8000).putInt(32000).putShort(4).putShort(16)
      b.put("data".getBytes).putInt(8)
      b.putShort(100).putShort(200).putShort(-50).putShort(150)
      b.array()
    }
    val Some((_, mono)) = Wav.decode(stereo)
    assert(mono.toSeq === Seq[Short](150, 50))
    assert(Wav.decode("not audio at all".getBytes) === None)
    assert(Wav.decode(canonical.take(30)) === None, "truncated")
    // float PCM (format tag 3) is out of scope → None, not garbage
    val floatTag = canonical.clone(); floatTag(20) = 3
    assert(Wav.decode(floatTag) === None)
  }

  test("audioPhash: fingerprint equals the planted code; twins never flip a bit") {
    for (id <- 0L until 200L) {
      val s = AudioPhash.gridCodeSamples(id)
      val code = ImagePhash.splitmix64(id)
      assert(AudioPhash.audioPhash(AudioPhash.SampleRate, s) === code, s"raw id $id")
      val d1 = java.lang.Long.bitCount(
        AudioPhash.audioPhash(AudioPhash.SampleRate, AudioPhash.scaleTwin(s)) ^ code)
      val d2 = java.lang.Long.bitCount(
        AudioPhash.audioPhash(AudioPhash.SampleRate, AudioPhash.ditherTwin(id, s)) ^ code)
      val d3 = java.lang.Long.bitCount(
        AudioPhash.audioPhash(AudioPhash.SampleRate / 2, AudioPhash.resampleTwin(s)) ^ code)
      assert(d1 === 0, s"id $id gain twin flipped $d1 bits")
      assert(d2 === 0, s"id $id dither twin flipped $d2 bits")
      assert(d3 === 0, s"id $id resample twin flipped $d3 bits")
    }
  }

  test("audio_phash recovers exactly the planted twins from bytes alone") {
    AudioPhash.ensureAudioPhashFixture(spark)
    val out = AudioPhash.audioPhashQuery(spark, "unused").collect()
    assert(out.length === AudioPhash.NBaseAudio + 300)
    out.foreach { r =>
      val id = r.getLong(0)
      val dupOf = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val keep = r.getBoolean(2)
      if (id >= AudioPhash.AudioResampleOffset)
        assert(dupOf === Some(id - AudioPhash.AudioResampleOffset) && !keep, s"resample twin $id")
      else if (id >= AudioPhash.AudioDitherOffset)
        assert(dupOf === Some(id - AudioPhash.AudioDitherOffset) && !keep, s"dither twin $id")
      else if (id >= AudioPhash.AudioScaleOffset)
        assert(dupOf === Some(id - AudioPhash.AudioScaleOffset) && !keep, s"scale twin $id")
      else
        assert(dupOf === None && keep, s"base clip $id must not collide")
    }
  }
}
