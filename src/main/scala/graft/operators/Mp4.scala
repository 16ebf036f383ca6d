package graft.operators

/** Zero-dependency ISO-BMFF / MP4 container codec for motion-JPEG video
  * tracks (SURVEY.md §2.7 E4 — the container real crawls actually
  * contain, next to [[Avi]]; reference scope `flink-samples` has no media
  * operators, cited per SURVEY §2.7). ISO/IEC 14496-12 is the public
  * spec: a file is a tree of length-prefixed big-endian boxes; the frame
  * payloads live in `mdat`, and the `moov` metadata tree carries the
  * sample tables that index them — `stsz` (sizes), `stco`/`co64` (chunk
  * offsets), `stsc` (sample→chunk runs), `stts` (timing), `stsd` (the
  * codec sample entry; `jpeg` frames decode through the existing [[Jpeg]]
  * codec, so MP4 reuses the whole image stack per frame, as AVI does).
  *
  * Scope (documented, checked, never silently wrong — the [[Wav]]/[[Avi]]
  * discipline, long-arithmetic bounds everywhere):
  *  - decode: one video (`hdlr` = `vide`) track with a `jpeg` sample
  *    entry; any box order, unknown boxes skipped by declared size;
  *    32-bit and 64-bit box sizes, mvhd/mdhd/tkhd versions 0 and 1,
  *    `stco` and `co64`, multi-entry `stsc` runs; malformed sizes, a
  *    missing table, or zero samples → None, never a throw;
  *  - encode: canonical single-track writer — ftyp + mdat + trailing
  *    moov (the finalize-at-end layout real muxers produce), all-v0
  *    headers, one chunk holding all samples, µs timescale.
  */
object Mp4 {

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i).toLong & 0xffffffffL) << 32) | (be32(b, i + 4).toLong & 0xffffffffL)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Microsecond timescale: sample deltas ARE frame periods in µs. */
  val Timescale = 1000000

  // ------------------------------------------------------------- encode

  /** Canonical single-track MJPEG MP4. `frames` are complete JPEG
    * payloads (one sample each, all in one chunk inside `mdat`). */
  def encode(usPerFrame: Int, w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "an MP4 needs at least one frame")
    val n = frames.length
    val duration = n.toLong * usPerFrame
    val mdatBody = frames.map(_.length).sum
    val ftyp = box("ftyp",
      bytes("isom".getBytes("US-ASCII"), int32(0x200),
        "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII")))
    val mdatOff = ftyp.length.toLong + 8 // first sample's absolute offset
    val stsd = fullBox("stsd", 0, 0, bytes(int32(1), jpegSampleEntry(w, h)))
    val stts = fullBox("stts", 0, 0, bytes(int32(1), int32(n), int32(usPerFrame)))
    val stsc = fullBox("stsc", 0, 0, bytes(int32(1), int32(1), int32(n), int32(1)))
    val stsz = fullBox("stsz", 0, 0,
      bytes(Seq(int32(0), int32(n)) ++ frames.map(f => int32(f.length)): _*))
    val stco = fullBox("stco", 0, 0, bytes(int32(1), int32(mdatOff.toInt)))
    val stbl = box("stbl", bytes(stsd, stts, stsc, stsz, stco))
    val dinf = box("dinf", fullBox("dref", 0, 0,
      bytes(int32(1), fullBox("url ", 0, 1, Array.emptyByteArray))))
    val vmhd = fullBox("vmhd", 0, 1, bytes(int16(0), int16(0), int16(0), int16(0)))
    val hdlr = fullBox("hdlr", 0, 0, bytes(int32(0),
      "vide".getBytes("US-ASCII"), int32(0), int32(0), int32(0),
      "graft".getBytes("US-ASCII"), Array[Byte](0))) // null-terminated name
    val mdhd = fullBox("mdhd", 0, 0, bytes(int32(0), int32(0),
      int32(Timescale), int32(duration.toInt), int16(0x55c4), int16(0)))
    val minf = box("minf", bytes(vmhd, dinf, stbl))
    val mdia = box("mdia", bytes(mdhd, hdlr, minf))
    val tkhd = fullBox("tkhd", 0, 3, bytes(int32(0), int32(0), int32(1),
      int32(0), int32(duration.toInt), int32(0), int32(0), int16(0), int16(0),
      int16(0), int16(0), identityMatrix, int32(w << 16), int32(h << 16)))
    val mvhd = fullBox("mvhd", 0, 0, bytes(int32(0), int32(0),
      int32(Timescale), int32(duration.toInt), int32(0x00010000), int16(0x0100),
      int16(0), int32(0), int32(0), identityMatrix,
      int32(0), int32(0), int32(0), int32(0), int32(0), int32(0), int32(2)))
    val moov = box("moov", bytes(mvhd, box("trak", bytes(tkhd, mdia))))
    val mdat = box("mdat", bytes(frames: _*))
    bytes(ftyp, mdat, moov)
  }

  private def int32(v: Int): Array[Byte] =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def int16(v: Int): Array[Byte] =
    Array[Byte]((v >> 8).toByte, v.toByte)
  private def bytes(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }
  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    bytes(int32(body.length + 8), tpe.getBytes("US-ASCII"), body)
  private def fullBox(tpe: String, version: Int, flags: Int, body: Array[Byte]): Array[Byte] =
    box(tpe, bytes(int32((version << 24) | (flags & 0xffffff)), body))
  private val identityMatrix: Array[Byte] = bytes(
    int32(0x00010000), int32(0), int32(0),
    int32(0), int32(0x00010000), int32(0),
    int32(0), int32(0), int32(0x40000000))

  /** VisualSampleEntry (14496-12 §12.1.3) with fourcc `jpeg`, 86 bytes. */
  private def jpegSampleEntry(w: Int, h: Int): Array[Byte] = bytes(
    int32(86), "jpeg".getBytes("US-ASCII"),
    int32(0), int16(0), int16(1),              // reserved ×6, data_ref_idx
    int32(0), int32(0), int32(0), int32(0),    // pre_defined / reserved
    int16(w), int16(h),
    int32(0x00480000), int32(0x00480000),      // 72 dpi
    int32(0), int16(1),                        // reserved, frame_count
    new Array[Byte](32),                       // compressorname (empty)
    int16(24), int16(0xffff))                  // depth, pre_defined = -1

  // ------------------------------------------------------------- decode

  /** Box walk over payload[from, until): invokes `f((type, bodyFrom,
    * bodyUntil))` per box; returns false on malformed sizes. */
  private def walkBoxes(payload: Array[Byte], from: Int, until: Int)(
      f: ((String, Int, Int)) => Boolean): Boolean = {
    var i = from
    while (i + 8 <= until) {
      val sz32 = be32(payload, i)
      val tpe = fourcc(payload, i + 4)
      var bodyFrom = i + 8L
      val boxLen: Long =
        if (sz32 == 1) { // 64-bit largesize follows the type
          if (i + 16L > until) return false
          bodyFrom = i + 16L
          be64(payload, i + 8)
        } else if (sz32 == 0) (until - i).toLong // box extends to the end
        else (sz32.toLong & 0xffffffffL)
      // long arithmetic: a declared size near max must not wrap the check.
      // A largesize box's header is 16 bytes (size32 + type + size64), so
      // boxLen in [8,16) would put bodyFrom past the box end and hand the
      // handler an inverted (from > until) range — reject it here rather
      // than rely on every handler's bound checks.
      if (boxLen < (if (sz32 == 1) 16L else 8L) || i + boxLen > until) return false
      if (!f((tpe, bodyFrom.toInt, (i + boxLen).toInt))) return false
      i = (i + boxLen).toInt
    }
    true
  }

  private final class Tables {
    var timescale = 0L
    var sampleDeltaUs = 0L
    var isVideo = false
    var isJpeg = false
    var w = 0; var h = 0
    var sizes: Array[Int] = null
    var chunkOffsets: Array[Long] = null
    // stsc runs: (first_chunk, samples_per_chunk), 1-based
    var stsc: Array[(Int, Int)] = null
  }

  /** Parse one trak's mdia/minf/stbl tree into Tables. */
  private def parseTrak(payload: Array[Byte], from: Int, until: Int, t: Tables): Boolean =
    walkBoxes(payload, from, until) { case (tpe, b, e) => tpe match {
      case "tkhd" =>
        // width/height are the LAST two 16.16 values of the box — the
        // anchor holds for versions 0 and 1 alike
        if (e - b < 8) false
        else {
          t.w = be32(payload, e - 8) >>> 16
          t.h = be32(payload, e - 4) >>> 16
          true
        }
      case "mdia" | "minf" | "stbl" => parseTrak(payload, b, e, t)
      case "mdhd" =>
        val v = payload(b) & 0xff
        val tsOff = if (v == 1) b + 4 + 16 else b + 4 + 8
        if (tsOff + 4 > e) false
        else { t.timescale = be32(payload, tsOff).toLong & 0xffffffffL; true }
      case "hdlr" =>
        if (b + 12 > e) false
        else { t.isVideo = fourcc(payload, b + 8) == "vide"; true }
      case "stsd" =>
        if (b + 16 > e) false
        else { t.isJpeg = fourcc(payload, b + 12) == "jpeg"; true }
      case "stts" =>
        val nEnt = if (b + 8 <= e) be32(payload, b + 4) else -1
        if (nEnt < 1 || b + 8L + 8L * nEnt > e) false
        else {
          // constant frame rate: one delta (the writer's shape); variable
          // rates take the FIRST run's delta — sampling is duration-
          // normalized downstream, so a near-constant file still fingerprints
          t.sampleDeltaUs = be32(payload, b + 12).toLong & 0xffffffffL
          true
        }
      case "stsz" =>
        if (b + 12 > e) false
        else {
          val fixed = be32(payload, b + 4)
          val n = be32(payload, b + 8)
          if (n < 0 || n > (1 << 22)) false // sane sample-count cap
          else if (fixed != 0) { t.sizes = Array.fill(n)(fixed); true }
          else if (b + 12L + 4L * n > e) false
          else {
            t.sizes = Array.tabulate(n)(k => be32(payload, b + 12 + 4 * k))
            true
          }
        }
      case "stsc" =>
        val n = if (b + 8 <= e) be32(payload, b + 4) else -1
        if (n < 1 || b + 8L + 12L * n > e) false
        else {
          t.stsc = Array.tabulate(n)(k =>
            (be32(payload, b + 8 + 12 * k), be32(payload, b + 12 + 12 * k)))
          true
        }
      case "stco" =>
        val n = if (b + 8 <= e) be32(payload, b + 4) else -1
        if (n < 0 || b + 8L + 4L * n > e) false
        else {
          t.chunkOffsets = Array.tabulate(n)(k =>
            be32(payload, b + 8 + 4 * k).toLong & 0xffffffffL)
          true
        }
      case "co64" =>
        val n = if (b + 8 <= e) be32(payload, b + 4) else -1
        if (n < 0 || b + 8L + 8L * n > e) false
        else {
          t.chunkOffsets = Array.tabulate(n)(k => be64(payload, b + 8 + 8 * k))
          true
        }
      case _ => true // unknown boxes: skip by declared size
    } }

  /** Chunk-walking decode → the shared [[Avi.Video]] shape. */
  def decode(payload: Array[Byte]): Option[Avi.Video] = {
    if (payload.length < 12 || fourcc(payload, 4) != "ftyp") return None
    var found: Tables = null
    val ok = walkBoxes(payload, 0, payload.length) { case (tpe, b, e) =>
      if (tpe != "moov") true
      else walkBoxes(payload, b, e) { case (t2, tb, te) =>
        if (t2 != "trak") true
        else {
          val t = new Tables
          if (!parseTrak(payload, tb, te, t)) false
          else {
            if (t.isVideo && t.isJpeg && found == null) found = t
            true
          }
        }
      }
    }
    if (!ok || found == null) return None
    val t = found
    if (t.timescale <= 0 || t.sampleDeltaUs <= 0 || t.w <= 0 || t.h <= 0 ||
      t.sizes == null || t.sizes.isEmpty ||
      t.chunkOffsets == null || t.chunkOffsets.isEmpty || t.stsc == null) return None
    val usPerFrame = t.sampleDeltaUs * Timescale / t.timescale
    if (usPerFrame <= 0 || usPerFrame > Int.MaxValue) return None
    // expand stsc runs over the chunk list → per-sample (offset, size)
    val frames = new Array[Array[Byte]](t.sizes.length)
    var sample = 0
    var run = 0
    var chunk = 1 // 1-based
    while (chunk <= t.chunkOffsets.length && sample < t.sizes.length) {
      while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= chunk) run += 1
      val perChunk = t.stsc(run)._2
      var off = t.chunkOffsets(chunk - 1)
      var s = 0
      while (s < perChunk && sample < t.sizes.length) {
        val len = t.sizes(sample)
        if (len < 0 || off < 0 || off + len > payload.length) return None
        frames(sample) = java.util.Arrays.copyOfRange(
          payload, off.toInt, (off + len).toInt)
        off += len
        sample += 1
        s += 1
      }
      chunk += 1
    }
    if (sample != t.sizes.length) return None
    Some(Avi.Video(usPerFrame.toInt, t.w, t.h, frames))
  }
}
