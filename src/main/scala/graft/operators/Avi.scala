package graft.operators

/** Zero-dependency RIFF/AVI MJPEG container codec (SURVEY.md §2.7 E4 —
  * the VIDEO modality's container, completing the image/audio/video
  * trio next to [[ImagePhash.Png]]/[[Jpeg]] and [[Wav]]; reference scope
  * `flink-samples` has no media operators, cited per SURVEY §2.7). AVI
  * is the public Microsoft "AVI RIFF File Reference" format: the same
  * little-endian RIFF chunk grammar as WAV, with nested LIST chunks —
  * `hdrl` (an `avih` main header + one `strl` stream header per stream)
  * and `movi` (the frame payloads, `00dc` compressed-video chunks). For
  * the MJPEG handler each `00dc` chunk is a complete baseline JPEG, so
  * the frame payloads decode through the existing [[Jpeg]] codec — the
  * whole video stack reuses the image stack per frame.
  *
  * Scope (documented, checked, never silently wrong):
  *  - decode: single-video-stream MJPEG; `avih` must appear inside
  *    `hdrl` before `movi` (a reader cannot time frames without it);
  *    frame chunks are `##dc`/`##db` inside `movi` (direct or inside
  *    `rec ` groups — both real-writer layouts); unknown chunks
  *    (`idx1`, `JUNK`, `INFO`, `vprp`…) are SKIPPED by declared size
  *    + even padding, the parser behavior that makes files from
  *    arbitrary writers readable; malformed sizes, zero frames, or a
  *    missing header → None, never a throw;
  *  - encode: canonical writer — `hdrl` (avih + vids/MJPG strl with
  *    BITMAPINFOHEADER strf), `movi`, and an `idx1` OLD-INDEX (offsets
  *    relative to the `movi` fourcc, AVIIF_KEYFRAME on every frame —
  *    MJPEG frames are all key frames), AVIF_HASINDEX flagged.
  */
object Avi {

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")

  /** A decoded video: frame period in microseconds, declared dimensions,
    * and the per-frame JPEG payloads in presentation order. */
  final case class Video(usPerFrame: Int, width: Int, height: Int,
      frames: Array[Array[Byte]])

  /** Canonical single-stream MJPEG AVI. `frames` are complete JPEG
    * payloads (one `00dc` chunk each). */
  def encode(usPerFrame: Int, w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val maxFrame = frames.map(_.length).max
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val idx1Body = 16 * frames.length
    // RIFF size spans everything after the 8-byte RIFF header:
    // 'AVI ' + LIST hdrl (8+4+(8+56)+(8+4+(8+56)+(8+40))) + LIST movi + idx1
    val hdrlBody = 4 + 64 + (8 + 4 + 64 + 48)
    val riffBody = 4 + (8 + hdrlBody) + (8 + 4 + moviBody) + (8 + idx1Body)
    val b = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    cc("RIFF"); b.putInt(riffBody); cc("AVI ")
    cc("LIST"); b.putInt(hdrlBody); cc("hdrl")
    cc("avih"); b.putInt(56)
    b.putInt(usPerFrame).putInt(0).putInt(0)
      .putInt(0x10)            // AVIF_HASINDEX
      .putInt(frames.length).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    cc("LIST"); b.putInt(4 + 64 + 48); cc("strl")
    cc("strh"); b.putInt(56)
    cc("vids"); cc("MJPG")
    b.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame)      // dwScale
      .putInt(1000000)         // dwRate → fps = rate/scale
      .putInt(0).putInt(frames.length).putInt(maxFrame)
      .putInt(-1)              // quality: default
      .putInt(0)               // sample size: varies per frame
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    cc("strf"); b.putInt(40)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    cc("MJPG")
    b.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); b.putInt(4 + moviBody); cc("movi")
    val offsets = new Array[Int](frames.length)
    var rel = 4 // OLD-INDEX offsets point at each chunk's fourcc, relative to 'movi'
    var i = 0
    while (i < frames.length) {
      offsets(i) = rel
      cc("00dc"); b.putInt(frames(i).length); b.put(frames(i))
      if ((frames(i).length & 1) == 1) b.put(0.toByte)
      rel += 8 + frames(i).length + (frames(i).length & 1)
      i += 1
    }
    cc("idx1"); b.putInt(idx1Body)
    i = 0
    while (i < frames.length) {
      cc("00dc"); b.putInt(0x10) // AVIIF_KEYFRAME
      b.putInt(offsets(i)).putInt(frames(i).length)
      i += 1
    }
    b.array()
  }

  /** Collect `##dc`/`##db` frame chunks from a `movi` (or nested `rec `)
    * LIST body. Returns false on a malformed size. */
  private def collectFrames(payload: Array[Byte], from: Int, until: Int,
      out: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Boolean = {
    var i = from
    while (i + 8 <= until) {
      val id = fourcc(payload, i)
      val len = le32(payload, i + 4)
      if (len < 0 || i + 8L + len > until) return false // long: len near MaxValue must not wrap
      if (id == "LIST" && len >= 4 && fourcc(payload, i + 8) == "rec ") {
        if (!collectFrames(payload, i + 12, i + 8 + len, out)) return false
      } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) && len > 0) {
        out += java.util.Arrays.copyOfRange(payload, i + 8, i + 8 + len)
      } // idx1/JUNK/…: skip by declared size
      i += 8 + len + (len & 1)
    }
    true
  }

  /** Chunk-walking decode. Accepts unknown top-level and `hdrl` chunks;
    * requires `avih` (inside `LIST hdrl`) before `LIST movi`. */
  def decode(payload: Array[Byte]): Option[Video] = {
    if (payload.length < 24) return None
    if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ") return None
    var i = 12
    var usPerFrame = 0; var w = 0; var h = 0
    var headerOk = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (i + 8 <= payload.length) {
      val id = fourcc(payload, i)
      val len = le32(payload, i + 4)
      if (len < 0 || i + 8L + len > payload.length) return None // long: no int wrap
      if (id == "LIST" && len >= 4) {
        fourcc(payload, i + 8) match {
          case "hdrl" =>
            // walk the header list for avih; strl/vprp/odml skipped by size
            var j = i + 12
            val end = i + 8 + len
            while (j + 8 <= end) {
              val hid = fourcc(payload, j)
              val hlen = le32(payload, j + 4)
              if (hlen < 0 || j + 8L + hlen > end) return None // long: no int wrap
              if (hid == "avih" && hlen >= 40) {
                usPerFrame = le32(payload, j + 8)
                w = le32(payload, j + 8 + 32)
                h = le32(payload, j + 8 + 36)
                if (usPerFrame <= 0 || w <= 0 || h <= 0) return None
                headerOk = true
              }
              j += 8 + hlen + (hlen & 1)
            }
          case "movi" =>
            if (!headerOk) return None
            if (!collectFrames(payload, i + 12, i + 8 + len, frames)) return None
          case _ => // INFO/…: skip
        }
      } // idx1/JUNK/…: skip by declared size
      i += 8 + len + (len & 1)
    }
    if (headerOk && frames.nonEmpty) Some(Video(usPerFrame, w, h, frames.toArray))
    else None
  }
}
