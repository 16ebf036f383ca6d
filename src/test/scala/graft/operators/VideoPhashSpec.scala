package graft.operators

import graft.SparkSpec

/** AVI codec + video frame-sampling fingerprint (SURVEY.md §2.7 E4):
  * container round-trip and structural rejection, time-normalized
  * sampling (frame-rate invariance by construction), per-slot hash
  * equality across the planted degradations, and the `video_phash`
  * key's end-to-end planted-twin recovery. */
class VideoPhashSpec extends SparkSpec {

  private def jpegFrames(n: Int): Array[Array[Byte]] =
    Array.tabulate(n) { i =>
      val (w, h, px) = ImagePhash.gridCodePixels(900000L + i)
      Jpeg.encode(w, h, px, quality = 90)
    }

  test("avi: encode→decode round-trips header fields and frame bytes") {
    val frames = jpegFrames(5)
    val payload = Avi.encode(40000, 100, 66, frames)
    val Some(v) = Avi.decode(payload)
    assert(v.usPerFrame === 40000)
    assert(v.width === 100 && v.height === 66)
    assert(v.frames.length === 5)
    v.frames.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("avi: skips unknown chunks, walks rec  groups, rejects junk — never throws") {
    val frames = jpegFrames(3)
    val canonical = Avi.encode(40000, 100, 66, frames)
    // splice a JUNK chunk between hdrl and movi: a conformant reader skips it
    val hdrlEnd = {
      // RIFF(12) + LIST hdrl(8+len)
      val len = (canonical(16) & 0xff) | ((canonical(17) & 0xff) << 8) |
        ((canonical(18) & 0xff) << 16) | ((canonical(19) & 0xff) << 24)
      12 + 8 + len
    }
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = canonical.take(hdrlEnd) ++ junk ++ canonical.drop(hdrlEnd)
    val Some(v) = Avi.decode(spliced)
    assert(v.frames.length === 3, "JUNK chunk skipped")
    // a movi whose frames sit inside a 'rec ' grouping LIST (interleaved-
    // writer layout): the walk recurses into it
    val f0 = frames(0)
    val recBody = "rec ".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ {
        val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putInt(f0.length); b.array()
      } ++ f0 ++ (if ((f0.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    val recChunk = "LIST".getBytes("US-ASCII") ++ {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(recBody.length); b.array()
    } ++ recBody
    // graft the rec  group as a second movi entry set by rebuilding: easier
    // end-to-end — decode a hand-built minimal AVI with rec -wrapped movi
    val hdrl = canonical.slice(12, hdrlEnd)
    val movi = "LIST".getBytes("US-ASCII") ++ {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(4 + recChunk.length); b.array()
    } ++ "movi".getBytes("US-ASCII") ++ recChunk
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val handBuilt = "RIFF".getBytes("US-ASCII") ++ {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(body.length); b.array()
    } ++ body
    val Some(vr) = Avi.decode(handBuilt)
    assert(vr.frames.length === 1 && vr.frames(0).toSeq === f0.toSeq, "rec  group walked")
    // rejections: non-AVI RIFF (a WAV), non-RIFF, truncation, no frames
    val wav = Wav.encode(8000, Array.tabulate[Short](100)(_.toShort))
    assert(Avi.decode(wav) === None, "WAV is RIFF but not AVI ")
    assert(Avi.decode("not a video".getBytes) === None)
    assert(Avi.decode(canonical.take(40)) === None, "truncated header")
    assert(Avi.decode(canonical.take(hdrlEnd)) === None, "no movi → no frames")
  }

  test("mp4: encode→decode round-trips header fields and frame bytes") {
    val frames = jpegFrames(5)
    val payload = Mp4.encode(40000, 100, 66, frames)
    val Some(v) = Mp4.decode(payload)
    assert(v.usPerFrame === 40000)
    assert(v.width === 100 && v.height === 66)
    assert(v.frames.length === 5)
    v.frames.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("mp4: unknown boxes skipped, cross-container fingerprint equal, junk rejected — never throws") {
    val frames = jpegFrames(4)
    val canonical = Mp4.encode(40000, 100, 66, frames)
    // splice a `free` box between ftyp and mdat: byte offsets in stco
    // shift, so a conformant writer would rewrite them — instead splice
    // AFTER mdat (before moov), where offsets stay valid
    val ftypLen = ((canonical(0) & 0xff) << 24) | ((canonical(1) & 0xff) << 16) |
      ((canonical(2) & 0xff) << 8) | (canonical(3) & 0xff)
    val mdatLen = ((canonical(ftypLen) & 0xff) << 24) |
      ((canonical(ftypLen + 1) & 0xff) << 16) |
      ((canonical(ftypLen + 2) & 0xff) << 8) | (canonical(ftypLen + 3) & 0xff)
    val cut = ftypLen + mdatLen
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](9, 9, 9, 9)
    val spliced = canonical.take(cut) ++ free ++ canonical.drop(cut)
    val Some(vs) = Mp4.decode(spliced)
    assert(vs.frames.length === 4, "free box skipped")
    // the SAME frames in both containers decode to identical videos —
    // so the video fingerprint is container-invariant by construction
    val avi = Avi.decode(Avi.encode(40000, 100, 66, frames)).get
    val mp4 = Mp4.decode(canonical).get
    assert(avi.usPerFrame === mp4.usPerFrame)
    assert(avi.frames.length === mp4.frames.length)
    avi.frames.zip(mp4.frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    assert(VideoPhash.videoPhash(Avi.encode(40000, 100, 66, frames)).get.toSeq ===
      VideoPhash.videoPhash(canonical).get.toSeq, "dispatch: same fingerprint")
    // rejections
    assert(Mp4.decode("not a video at all".getBytes) === None)
    assert(Mp4.decode(canonical.take(40)) === None, "truncated: no moov")
    assert(Mp4.decode(canonical.take(cut)) === None, "mdat but no moov")
    val wav = Wav.encode(8000, Array.tabulate[Short](100)(_.toShort))
    assert(Mp4.decode(wav) === None)
    assert(VideoPhash.decodeVideo(wav) === None, "dispatch rejects non-video RIFF")
  }

  test("sampleIndices: time-normalized — base and half-rate twin sample the same scenes") {
    val base = VideoPhash.sampleIndices(VideoPhash.Slots * VideoPhash.FramesPerScene)
    val half = VideoPhash.sampleIndices(VideoPhash.Slots)
    for (j <- 0 until VideoPhash.Slots) {
      assert(base(j) / VideoPhash.FramesPerScene === j, s"base slot $j lands mid-scene")
      assert(half(j) === j, s"half-rate slot $j lands on scene $j")
    }
    // degenerate short video: indices stay in range
    assert(VideoPhash.sampleIndices(1).forall(_ == 0))
    assert(VideoPhash.sampleIndices(3).forall(i => i >= 0 && i < 3))
  }

  test("videoPhash: slot hashes equal the planted scene codes; twins stay within radius") {
    for (id <- 0L until 30L) {
      val Some(base) = VideoPhash.videoPhash(VideoPhash.baseVideo(id))
      assert(base.length === VideoPhash.Slots)
      for (s <- 0 until VideoPhash.Slots) {
        val code = ImagePhash.splitmix64(id * VideoPhash.Slots + s)
        val d = java.lang.Long.bitCount(base(s) ^ code)
        assert(d <= ImagePhash.HammingMax, s"id $id slot $s drifted $d bits at q90")
      }
      for ((twin, kind) <- Seq((VideoPhash.requalTwin(id), "requal"),
          (VideoPhash.fpsTwin(id), "fps"), (VideoPhash.brightTwin(id), "bright"))) {
        val Some(t) = VideoPhash.videoPhash(twin)
        val within = (0 until VideoPhash.Slots).count(s =>
          java.lang.Long.bitCount(base(s) ^ t(s)) <= ImagePhash.HammingMax)
        assert(within >= VideoPhash.SlotsMin,
          s"id $id $kind twin: only $within/${VideoPhash.Slots} slots within radius")
      }
    }
  }

  test("video_phash recovers exactly the planted twins from bytes alone") {
    VideoPhash.ensureVideoPhashFixture(spark)
    val out = VideoPhash.videoPhashQuery(spark, "unused").collect()
    assert(out.length === VideoPhash.NBaseVideo + 200)
    out.foreach { r =>
      val id = r.getLong(0)
      val dupOf = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val keep = r.getBoolean(2)
      if (id >= VideoPhash.VideoMp4Offset)
        assert(dupOf === Some(id - VideoPhash.VideoMp4Offset) && !keep, s"mp4 twin $id")
      else if (id >= VideoPhash.VideoBrightOffset)
        assert(dupOf === Some(id - VideoPhash.VideoBrightOffset) && !keep, s"bright twin $id")
      else if (id >= VideoPhash.VideoFpsOffset)
        assert(dupOf === Some(id - VideoPhash.VideoFpsOffset) && !keep, s"fps twin $id")
      else if (id >= VideoPhash.VideoRequalOffset)
        assert(dupOf === Some(id - VideoPhash.VideoRequalOffset) && !keep, s"requal twin $id")
      else
        assert(dupOf === None && keep, s"base video $id must not collide")
    }
  }
}
