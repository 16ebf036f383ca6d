package graft.operators

/** Zero-dependency RIFF/WAVE PCM codec (SURVEY.md §2.7 E4 — the audio
  * modality's container, as [[ImagePhash.Png]]/[[Jpeg]] are the image
  * modality's; reference scope `flink-samples` has no media operators,
  * cited per SURVEY §2.7). WAV is the public Microsoft/IBM RIFF format:
  * little-endian chunks, a `fmt ` chunk declaring the sample layout, a
  * `data` chunk of raw PCM. PCM is lossless — unlike JPEG there is no
  * quantization; the lossy transforms the audio near-dup layer must
  * absorb are gain changes, dither, and resampling, which the
  * [[AudioPhash]] fingerprint handles.
  *
  * Scope (documented, checked, never silently wrong):
  *  - decode: PCM (format tag 1), 16-bit, mono or stereo (stereo is
  *    downmixed to mono by averaging — the fingerprint layer is
  *    mono-only by design); unknown chunks (LIST, fact, cue…) are
  *    SKIPPED by their declared size, the real parser behavior that
  *    makes files from arbitrary writers readable; anything else
  *    (float PCM, 8/24-bit, ADPCM, truncation) → None, never a throw;
  *  - encode: canonical 44-byte header + 16-bit little-endian mono PCM.
  */
object Wav {

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Canonical mono PCM16 WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits/sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Chunk-walking decode → (sampleRate, mono PCM16 samples). Accepts any
    * chunk order and unknown chunks; requires `fmt ` before `data` (the
    * spec's practical invariant — a reader cannot interpret data bytes
    * without the layout). */
  def decode(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload.length < 44) return None
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F')) return None
    if (!(payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')) return None
    var i = 12
    var rate = 0
    var channels = 0
    var bits = 0
    var fmtOk = false
    while (i + 8 <= payload.length) {
      val id = new String(payload, i, 4, "US-ASCII")
      val len = le32(payload, i + 4)
      // LONG arithmetic: a declared len near Int.MaxValue overflows the int
      // sum negative and would bypass the bound (matching Png.decodePixels'
      // `i + 12L + len` discipline).
      if (len < 0 || i + 8L + len > payload.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val tag = le16(payload, i + 8)
          channels = le16(payload, i + 10)
          rate = le32(payload, i + 12)
          bits = le16(payload, i + 22)
          if (tag != 1 || bits != 16 || (channels != 1 && channels != 2) || rate <= 0) return None
          fmtOk = true
        case "data" =>
          if (!fmtOk) return None
          val frame = 2 * channels
          val n = len / frame
          val out = new Array[Short](n)
          var k = 0
          while (k < n) {
            val p = i + 8 + k * frame
            out(k) =
              if (channels == 1) le16(payload, p).toShort
              else (((le16(payload, p).toShort + le16(payload, p + 2).toShort)) / 2).toShort
            k += 1
          }
          return Some((rate, out))
        case _ => // LIST/fact/cue/…: skip by declared size (+pad to even)
      }
      i += 8 + len + (len & 1)
    }
    None
  }
}
