package graft.operators

/** Zero-dependency baseline JPEG codec (SURVEY.md §2.7 E4 — the lossy
  * half of the image modality; [[ImagePhash.Png]] is the lossless half).
  * Implements the baseline sequential DCT process of the public JPEG
  * spec (ITU-T T.81): entropy-coded 8×8 blocks — canonical Huffman codes
  * built from the DHT BITS/HUFFVAL lists, DC prediction with EXTEND,
  * AC run/size coding with ZRL/EOB, byte stuffing — over quantized
  * forward/inverse DCT and the JFIF YCbCr transform.
  *
  * Scope (documented, checked, never silently wrong):
  *  - decode: baseline sequential, 8-bit, 1 (grayscale) or 3 (YCbCr
  *    4:4:4) components, one interleaved scan, restart markers honored;
  *    progressive / subsampled / arithmetic streams return None;
  *  - encode: 4:4:4, quality-scaled Annex-K-style quant tables, flat
  *    canonical Huffman tables (all 12 DC categories at 4 bits, all 162
  *    AC symbols at 8 bits — legal canonical codes any conformant
  *    decoder reads, chosen so the table constants are derived, not
  *    transcribed; compression ratio is not the point, valid structure
  *    is). The tables ride in the stream (DQT/DHT), so decode is fully
  *    general — it reads standard-table files too.
  *
  * JPEG is lossy: decode(encode(px)) ≈ px within quantization error —
  * which is exactly what the perceptual-hash layer exists to absorb, and
  * what makes the `media_phash` JPEG cases STRONGER than the PNG ones:
  * two different-quality encodes of one source, or a PNG and a JPEG of
  * the same pixels, differ at the byte AND pixel level yet land within
  * the dHash Hamming radius.
  */
object Jpeg {

  // --------------------------------------------------------- quant tables

  /** Annex-K-style base luminance quantization table (zigzag-free,
    * row-major). */
  private val QLumBase = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChromBase = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg-convention quality scaling: q∈[1,100] → per-entry clamp to
    * [1, 255]. */
  private def scaledTable(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  /** Zigzag scan order: zigzag(k) = row-major index of the k-th zigzag
    * coefficient. */
  private[operators] val Zigzag: Array[Int] = {
    val order = new Array[Int](64)
    var x = 0; var y = 0
    for (k <- 0 until 64) {
      order(k) = y * 8 + x
      if ((x + y) % 2 == 0) { // moving up-right
        if (x == 7) y += 1 else if (y == 0) x += 1 else { x += 1; y -= 1 }
      } else { // moving down-left
        if (y == 7) x += 1 else if (x == 0) y += 1 else { x -= 1; y += 1 }
      }
    }
    order
  }

  // ------------------------------------------------------------------ DCT

  private val CosTab = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2) else 1.0

  /** Forward 8×8 DCT of a level-shifted block (row-major doubles),
    * separable row-column form: 1-D transforms over rows then columns —
    * 2·8·64 multiplies per block instead of the naive 64·64. */
  private[operators] def fdct(b: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64) // tmp(y,u) = 0.5·c(u)·Σ_x b(y,x)·cos(x,u)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += b(y * 8 + x) * CosTab(x)(u); x += 1 }
        tmp(y * 8 + u) = 0.5 * c(u) * s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosTab(yy)(v); yy += 1 }
        out(v * 8 + u) = 0.5 * c(v) * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse 8×8 DCT, separable with zero-row skip: quantization zeroes
    * most high-v coefficient rows, so the row pass touches only non-zero
    * rows (the dominant win on real quantized blocks). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64) // tmp(v,x) = 0.5·Σ_u c(u)·coef(v,u)·cos(x,u)
    val rowNz = new Array[Boolean](8)
    var v = 0
    while (v < 8) {
      var nz = false
      var u = 0
      while (u < 8 && !nz) { nz = coef(v * 8 + u) != 0.0; u += 1 }
      rowNz(v) = nz
      if (nz) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var uu = 0
          while (uu < 8) { s += c(uu) * coef(v * 8 + uu) * CosTab(x)(uu); uu += 1 }
          tmp(v * 8 + x) = 0.5 * s
          x += 1
        }
      }
      v += 1
    }
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          if (rowNz(vv)) s += c(vv) * tmp(vv * 8 + x) * CosTab(y)(vv)
          vv += 1
        }
        out(y * 8 + x) = 0.5 * s
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- huffman

  /** Canonical Huffman code assignment from (BITS, HUFFVAL) — the T.81
    * C.2 procedure. Returns symbol → (code, length). */
  private def canonicalCodes(bits: Array[Int], huffval: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out(huffval(k)) = (code, len)
        code += 1; k += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Decoder-side canonical tables: per-length mincode/maxcode/valptr
    * (T.81 F.2.2.3). maxcode = -1 where a length has no codes. */
  private final class HuffTable(bits: Array[Int], val huffval: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valptr(len) = k
          mincode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxcode(len) = code - 1
        }
        code <<= 1
      }
    }
  }

  /** The encoder's flat tables (see scaladoc): DC = 12 categories × 4
    * bits; AC = the 162 baseline run/size symbols × 8 bits. */
  private val DcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val AcVals: Array[Int] = {
    val v = scala.collection.mutable.ArrayBuffer.empty[Int]
    v += 0x00 // EOB
    v += 0xf0 // ZRL
    for (r <- 0 to 15; s <- 1 to 10) v += ((r << 4) | s)
    v.toArray // 162 symbols
  }
  private val AcBits = {
    val b = new Array[Int](16)
    b(7) = AcVals.length // all at length 8
    b
  }

  // ------------------------------------------------------------ bit I/O

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** Entropy-segment bit reader: unstuffs FF00, stops at any other
    * marker (position rewinds so the caller sees it). Throws
    * [[Bad]] on truncation. */
  private object Bad extends Exception { override def fillInStackTrace(): Throwable = this }
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    var markerHit = -1
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw Bad
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) throw Bad
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else if (m >= 0xd0 && m <= 0xd7) { // restart marker: consume, continue
            pos += 1; markerHit = m
            if (pos >= data.length) throw Bad
            b = data(pos) & 0xff; pos += 1
            if (b == 0xff) throw Bad
          } else { markerHit = m; throw Bad } // EOI/next segment mid-read
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    /** Align to the next byte and consume an expected restart marker. */
    def syncRestart(): Boolean = {
      nbits = 0
      while (pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) >= 0xd0 && (data(pos + 1) & 0xff) <= 0xd7) {
        pos += 2; return true
      }
      false
    }
    def receive(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16) {
        if (t.maxcode(len) >= 0 && code <= t.maxcode(len))
          return t.huffval(t.valptr(len) + code - t.mincode(len))
        code = (code << 1) | bit()
        len += 1
      }
      throw Bad
    }
  }

  private def extend(v: Int, ssss: Int): Int =
    if (ssss == 0) 0 else if (v < (1 << (ssss - 1))) v - (1 << ssss) + 1 else v

  private def category(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ------------------------------------------------------------- encode

  /** Encode 8-bit RGB pixels (`rgb.length == w*h*3`, row-major) as a
    * baseline 4:4:4 JFIF JPEG at the given quality. `restartInterval > 0`
    * writes a DRI segment and emits RSTn markers every that many MCUs
    * (byte-aligned, DC predictors reset — T.81 §E.1.4), so the decoder's
    * restart path is exercised by real conformant streams. */
  def encode(w: Int, h: Int, rgb: Array[Byte], quality: Int = 85,
      restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    // plane extraction with edge replication to 8-multiples
    val bw = (w + 7) / 8 * 8; val bh = (h + 7) / 8 * 8
    val planes = Array.ofDim[Double](3, bw * bh)
    var y = 0
    while (y < bh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < bw) {
        val sx = math.min(x, w - 1)
        val i = (sy * w + sx) * 3
        val r = rgb(i) & 0xff; val g = rgb(i + 1) & 0xff; val b = rgb(i + 2) & 0xff
        planes(0)(y * bw + x) = 0.299 * r + 0.587 * g + 0.114 * b
        planes(1)(y * bw + x) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        planes(2)(y * bw + x) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        x += 1
      }
      y += 1
    }
    encodeCore(w, h, planes, quality, restartInterval)
  }

  /** Encode an 8-bit single-plane (grayscale) image as a 1-component
    * baseline JPEG — the nComp=1 decode path's real-stream witness. */
  def encodeGray(w: Int, h: Int, gray: Array[Byte], quality: Int = 85,
      restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == w * h, s"gray length ${gray.length} != ${w * h}")
    val bw = (w + 7) / 8 * 8; val bh = (h + 7) / 8 * 8
    val plane = new Array[Double](bw * bh)
    var y = 0
    while (y < bh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < bw) {
        plane(y * bw + x) = (gray(sy * w + math.min(x, w - 1)) & 0xff).toDouble
        x += 1
      }
      y += 1
    }
    encodeCore(w, h, Array(plane), quality, restartInterval)
  }

  private def encodeCore(w: Int, h: Int, planes: Array[Array[Double]],
      quality: Int, restartInterval: Int): Array[Byte] = {
    val nComp = planes.length
    val qLum = scaledTable(QLumBase, quality)
    val qChrom = scaledTable(QChromBase, quality)
    val bw = (w + 7) / 8 * 8; val bh = (h + 7) / 8 * 8
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val entropy = new java.io.ByteArrayOutputStream()
    val bw2 = new BitWriter(entropy)
    val pred = new Array[Int](nComp)
    val mcuX = bw / 8; val mcuY = bh / 8
    var mcu = 0
    var rstCount = 0
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw2.flush()
          entropy.write(0xff); entropy.write(0xd0 + rstCount % 8)
          rstCount += 1
          java.util.Arrays.fill(pred, 0)
        }
        var comp = 0
        while (comp < nComp) {
          val qt = if (comp == 0) qLum else qChrom
          val block = new Array[Double](64)
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              block(by * 8 + bx) = planes(comp)((my * 8 + by) * bw + mx * 8 + bx) - 128.0
              bx += 1
            }
            by += 1
          }
          val coefs = fdct(block)
          val quant = new Array[Int](64)
          var k = 0
          while (k < 64) {
            val rm = Zigzag(k)
            // clamp to the baseline coefficient range [-1023, 1023] (T.81
            // Table F.2 covers AC categories 1..10 only): at high quality the
            // small quant divisors can push a high-contrast block to
            // category 11, which acCodes has no entry for — the standard
            // baseline-encoder guard.
            val q = math.round(coefs(rm) / qt(rm)).toInt
            quant(k) = math.max(-1023, math.min(1023, q))
            k += 1
          }
          // DC (diff of clamped DCs is within [-2046, 2046] ⊂ category ≤ 11,
          // which dcCodes covers)
          val diff = quant(0) - pred(comp); pred(comp) = quant(0)
          val ssss = category(diff)
          val (dc, dl) = dcCodes(ssss)
          bw2.put(dc, dl)
          if (ssss > 0)
            bw2.put(if (diff < 0) diff + (1 << ssss) - 1 else diff, ssss)
          // AC
          var run = 0
          var kk = 1
          while (kk < 64) {
            val v = quant(kk)
            if (v == 0) run += 1
            else {
              while (run > 15) { val (zc, zl) = acCodes(0xf0); bw2.put(zc, zl); run -= 16 }
              val s = category(v)
              val (ac, al) = acCodes((run << 4) | s)
              bw2.put(ac, al)
              bw2.put(if (v < 0) v + (1 << s) - 1 else v, s)
              run = 0
            }
            kk += 1
          }
          if (run > 0) { val (ec, el) = acCodes(0x00); bw2.put(ec, el) }
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw2.flush()
    // ------- container
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(payload)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(id: Int, t: Array[Int]): Array[Byte] =
      (id.toByte +: (0 until 64).map(k => t(Zigzag(k)).toByte)).toArray
    seg(0xdb, dqt(0, qLum))
    if (nComp == 3) seg(0xdb, dqt(1, qChrom))
    seg(0xc0, (Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      nComp.toByte) ++
      (0 until nComp).flatMap(ci => Array[Byte]((ci + 1).toByte, 0x11,
        (if (ci == 0) 0 else 1).toByte))).toArray)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      (((cls << 4) | id).toByte +: (bits.map(_.toByte) ++ vals.map(_.toByte))).toArray
    seg(0xc4, dht(0, 0, DcBits, DcVals)); seg(0xc4, dht(1, 0, AcBits, AcVals))
    if (nComp == 3) {
      seg(0xc4, dht(0, 1, DcBits, DcVals)); seg(0xc4, dht(1, 1, AcBits, AcVals))
    }
    if (restartInterval > 0)
      seg(0xdd, Array[Byte]((restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    seg(0xda, (Array[Byte](nComp.toByte) ++
      (0 until nComp).flatMap(ci => Array[Byte]((ci + 1).toByte,
        (if (ci == 0) 0x00 else 0x11).toByte)) ++
      Array[Byte](0, 63, 0)).toArray)
    out.write(entropy.toByteArray)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Decode a baseline JPEG to (width, height, 8-bit RGB row-major).
    * None on progressive/subsampled/arithmetic/structurally-damaged
    * input — never throws, safe over a mixed corpus (the `media_dims`
    * fixture's header-only JPEGs land here: no scan data → None). */
  def decodePixels(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try decodeOrThrow(payload)
    catch { case scala.util.control.NonFatal(_) => None } // fatal VM errors (OOM, …) must surface, not read as "undecodable"
  }

  private def decodeOrThrow(d: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (d.length < 4 || (d(0) & 0xff) != 0xff || (d(1) & 0xff) != 0xd8) return None
    var pos = 2
    val qt = Array.ofDim[Int](4, 64) // row-major after de-zigzag
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var w = 0; var h = 0
    var nComp = 0
    var compQ: Array[Int] = null
    var restartInterval = 0
    var scan: Array[(Int, Int, Int)] = null // (compIdx, dcId, acId)
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > d.length) return None
      if ((d(pos) & 0xff) != 0xff) return None
      val marker = d(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before any scan
      val len = ((d(pos + 2) & 0xff) << 8) | (d(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > d.length) return None
      val body = pos + 4
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = body
          while (p < pos + 2 + len) {
            val prec = (d(p) & 0xf0) >> 4
            val id = d(p) & 0x0f
            if (id > 3) return None
            p += 1
            if (prec == 0) {
              if (p + 64 > pos + 2 + len) return None
              for (k <- 0 until 64) qt(id)(Zigzag(k)) = d(p + k) & 0xff
              p += 64
            } else {
              if (p + 128 > pos + 2 + len) return None
              for (k <- 0 until 64)
                qt(id)(Zigzag(k)) = ((d(p + 2 * k) & 0xff) << 8) | (d(p + 2 * k + 1) & 0xff)
              p += 128
            }
          }
        case 0xc4 => // DHT: one or more tables
          var p = body
          while (p < pos + 2 + len) {
            val cls = (d(p) & 0xf0) >> 4
            val id = d(p) & 0x0f
            if (id > 3 || cls > 1) return None
            val bits = (0 until 16).map(i => d(p + 1 + i) & 0xff).toArray
            val n = bits.sum
            if (p + 17 + n > pos + 2 + len) return None
            val vals = (0 until n).map(i => d(p + 17 + i) & 0xff).toArray
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTab(id) = t else acTab(id) = t
            p += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (len < 8) return None
          val prec = d(body) & 0xff
          h = ((d(body + 1) & 0xff) << 8) | (d(body + 2) & 0xff)
          w = ((d(body + 3) & 0xff) << 8) | (d(body + 4) & 0xff)
          nComp = d(body + 5) & 0xff
          if (prec != 8 || w == 0 || h == 0 || (nComp != 1 && nComp != 3)) return None
          compQ = new Array[Int](nComp)
          for (ci <- 0 until nComp) {
            val sampling = d(body + 6 + 3 * ci + 1) & 0xff
            if (sampling != 0x11) return None // 4:4:4 / grayscale only
            compQ(ci) = d(body + 6 + 3 * ci + 2) & 0xff
          }
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // progressive/extended/arithmetic: out of scope
        case 0xdd =>
          if (len != 4) return None
          restartInterval = ((d(body) & 0xff) << 8) | (d(body + 1) & 0xff)
        case 0xda => // SOS
          if (w == 0) return None
          val ns = d(body) & 0xff
          if (ns != nComp) return None // one interleaved scan only
          scan = (0 until ns).map { i =>
            val cid = d(body + 1 + 2 * i) & 0xff
            val tabs = d(body + 2 + 2 * i) & 0xff
            (cid - 1, (tabs & 0xf0) >> 4, tabs & 0x0f)
          }.toArray
          if (scan.exists { case (ci, dc, ac) =>
            ci < 0 || ci >= nComp || dcTab(dc) == null || acTab(ac) == null }) return None
          scanStart = pos + 2 + len
        case _ => () // APPn/COM/etc: skip
      }
      pos += 2 + len
    }
    // entropy-coded MCU loop
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val planes = Array.ofDim[Double](nComp, bw * 8 * bh * 8)
    val pred = new Array[Int](nComp)
    val br = new BitReader(d, scanStart)
    var mcu = 0
    val totalMcu = bw * bh
    while (mcu < totalMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.syncRestart()
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / bw; val mx = mcu % bw
      var si = 0
      while (si < nComp) {
        val (ci, dcId, acId) = scan(si)
        val quant = new Array[Int](64)
        val ssss = br.decode(dcTab(dcId))
        if (ssss > 11) throw Bad
        pred(ci) += extend(br.receive(ssss), ssss)
        quant(0) = pred(ci)
        var k = 1
        while (k < 64) {
          val rs = br.decode(acTab(acId))
          val r = (rs & 0xf0) >> 4; val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else k = 64 // EOB
          } else {
            k += r
            if (k > 63) throw Bad
            quant(k) = extend(br.receive(s), s)
            k += 1
          }
        }
        val q = qt(compQ(ci))
        val coefs = new Array[Double](64)
        var kk = 0
        while (kk < 64) { val rm = Zigzag(kk); coefs(rm) = quant(kk).toDouble * q(rm); kk += 1 }
        val px = idct(coefs)
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            planes(ci)((my * 8 + by) * (bw * 8) + mx * 8 + bx) = px(by * 8 + bx) + 128.0
            bx += 1
          }
          by += 1
        }
        si += 1
      }
      mcu += 1
    }
    // color convert + crop
    val rgb = new Array[Byte](w * h * 3)
    def clamp(v: Double): Byte =
      (if (v < 0) 0 else if (v > 255) 255 else math.round(v).toInt).toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * (bw * 8) + x
        if (nComp == 1) {
          val g = clamp(planes(0)(i))
          rgb(3 * (y * w + x)) = g; rgb(3 * (y * w + x) + 1) = g; rgb(3 * (y * w + x) + 2) = g
        } else {
          val yy = planes(0)(i); val cb = planes(1)(i) - 128.0; val cr = planes(2)(i) - 128.0
          rgb(3 * (y * w + x)) = clamp(yy + 1.402 * cr)
          rgb(3 * (y * w + x) + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(3 * (y * w + x) + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }
}
