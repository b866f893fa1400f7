package graft.functions

import java.io.ByteArrayOutputStream

/** Baseline JFIF (ITU T.81) encode + decode in pure JVM arithmetic — the
  * codec behind MJPEG video streams and the last multimodal payload the
  * engine treated as opaque. Built from the public spec alone, like
  * [[RiffWav]]/[[BmpImage]]/[[Rle8]]: no imaging library anywhere.
  *
  * Decoder scope (loud rejects outside it): baseline sequential DCT,
  * 8-bit precision, 1 or 3 components with no chroma subsampling
  * (all sampling factors 1×1 — the 4:4:4 layout MJPEG-class intra
  * streams use), restart markers (DRI/RSTn) honored, multi-table DQT and
  * DHT segments, the FULL run/size AC grammar (EOB, ZRL, any run/size
  * pair), 0xFF00 byte-unstuffing. Quant and Huffman tables are read from
  * the stream's own DQT/DHT segments — nothing is assumed baked in.
  *
  * Encoder: the exact inverse pipeline (level shift → FDCT → quantize →
  * zigzag → DPCM DC + run/size AC Huffman coding → stuffing), writing
  * Annex-K-style tables into the stream. Round-trip exactness for
  * block-constant inputs (each 8×8 block one flat sample) with a DC
  * quant step dividing 8 is an arithmetic identity: the only nonzero
  * coefficient is DC = 8·(s−128), which quantizes and reconstructs
  * without loss — the property q203's analytic oracle rides on, while
  * the spec exercises the general lossy path for coder symmetry.
  *
  * Pixel output is 0xRRGGBB with libjpeg's fixed-point YCbCr→RGB
  * constants (scale 2¹⁶, arithmetic-shift rounding) so an integer SQL
  * oracle can reproduce every channel exactly.
  */
object Jpeg {

  final case class JpegImage(width: Int, height: Int, nComponents: Int,
      pixels: Array[Int])

  // ----------------------------------------------------------------- //
  // Tables (public T.81 Annex K shapes). The encoder EMBEDS these in
  // DQT/DHT and the decoder reads them back from the stream, so coder
  // symmetry never depends on the constants matching any external file.
  // ----------------------------------------------------------------- //

  /** Zigzag scan: zigzag(k) = raster index of the k-th scanned coeff. */
  private[functions] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray

  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // ----------------------------------------------------------------- //
  // Huffman code construction (canonical, from BITS/HUFFVAL)
  // ----------------------------------------------------------------- //

  /** codes(symbol) = (code, length) for the encoder side. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  /** Decoder-side canonical table: per length, the smallest/largest code
    * and the index of its first symbol (the T.81 DECODE procedure).
    */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len) == 0) { maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def decode(in: BitReader): Int = {
      var len = 1
      var code = in.readBit()
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | in.readBit()
        len += 1
      }
      require(maxCode(len) >= 0 && code <= maxCode(len),
        s"invalid Huffman code (len $len)")
      vals(valPtr(len) + code - minCode(len)) & 0xff
    }
  }

  // ----------------------------------------------------------------- //
  // Bit IO with 0xFF00 stuffing and restart-marker awareness
  // ----------------------------------------------------------------- //

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad with 1-bits to a byte boundary (before RST/EOI), per spec. */
    def flush(): Unit =
      if (nbits > 0) { write((1 << (8 - nbits)) - 1, 8 - nbits) }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "entropy stream truncated")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "entropy stream truncated at 0xFF")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"unexpected marker 0xFF$m%02X inside scan")
          pos += 1
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Drop partial byte and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 2 <= bytes.length, "truncated at restart marker")
      require((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + expected),
        f"expected RST$expected at $pos, got " +
          f"${bytes(pos) & 0xff}%02X${bytes(pos + 1) & 0xff}%02X")
      pos += 2
    }
  }

  /** T.81 EXTEND: sign-extend an n-bit magnitude into a signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ----------------------------------------------------------------- //
  // DCT (double-precision reference transform, rounded)
  // ----------------------------------------------------------------- //

  private val CosTab: Array[Double] = {
    val t = new Array[Double](8 * 8) // t(x*8+u) = cos((2x+1)uπ/16)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def c0(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward DCT of one level-shifted 8×8 block (raster order in/out). */
  private[functions] def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * CosTab(x * 8 + v) * CosTab(y * 8 + u)
            x += 1
          }
          y += 1
        }
        out(u * 8 + v) = 0.25 * c0(u) * c0(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse DCT → level-shifted samples, rounded half-up to Int. */
  private[functions] def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val f = coef(u * 8 + v)
            if (f != 0)
              s += c0(u) * c0(v) * f * CosTab(x * 8 + v) * CosTab(y * 8 + u)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = math.floor(0.25 * s + 0.5).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  // ----------------------------------------------------------------- //
  // Encoder
  // ----------------------------------------------------------------- //

  /** Encode 4:4:4 three-component (or, with cb/cr null, grayscale)
    * 8-bit samples. Width and height must be multiples of 8 (MJPEG intra
    * frames are; general edge replication is an encoder nicety the
    * decode path never needs). `restartInterval` > 0 emits DRI + RSTn.
    */
  def encode(width: Int, height: Int,
      y: Array[Int], cb: Array[Int], cr: Array[Int],
      qLuma: Array[Int], qChroma: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "dimensions must be positive multiples of 8")
    require(y.length == width * height, "Y plane size mismatch")
    val gray = cb == null
    require(gray == (cr == null), "cb/cr must be both present or both null")
    if (!gray) require(cb.length == y.length && cr.length == y.length,
      "chroma plane size mismatch")
    require(qLuma.length == 64 && (gray || qChroma.length == 64),
      "quant tables are 64 entries")

    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }

    marker(0xd8) // SOI
    // APP0/JFIF
    marker(0xe0); u16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0))
    u16(1); u16(1); out.write(0); out.write(0)
    // DQT (table 0, + table 1 for color), zigzag order
    val nq = if (gray) 1 else 2
    marker(0xdb); u16(2 + 65 * nq)
    for (t <- 0 until nq) {
      out.write(t)
      val q = if (t == 0) qLuma else qChroma
      var k = 0
      while (k < 64) { out.write(q(Zigzag(k))); k += 1 }
    }
    // SOF0
    val nc = if (gray) 1 else 3
    marker(0xc0); u16(8 + 3 * nc)
    out.write(8); u16(height); u16(width); out.write(nc)
    for (c <- 1 to nc) {
      out.write(c); out.write(0x11) // 1×1 sampling
      out.write(if (c == 1) 0 else 1)
    }
    // DHT: DC0, AC0 (+ DC1, AC1 for color) in one segment
    val hts: Seq[(Int, Array[Int], Array[Byte])] =
      Seq((0x00, DcLumaBits, DcLumaVals), (0x10, AcLumaBits, AcLumaVals)) ++
        (if (gray) Nil
         else Seq((0x01, DcChromaBits, DcChromaVals),
           (0x11, AcChromaBits, AcChromaVals)))
    marker(0xc4); u16(2 + hts.map(h => 1 + 16 + h._3.length).sum)
    hts.foreach { case (id, bits, vals) =>
      out.write(id)
      for (l <- 1 to 16) out.write(bits(l))
      out.write(vals)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS
    marker(0xda); u16(6 + 2 * nc)
    out.write(nc)
    for (c <- 1 to nc) { out.write(c); out.write(if (c == 1) 0x00 else 0x11) }
    out.write(0); out.write(63); out.write(0)

    val dcLu = buildEncodeTable(DcLumaBits, DcLumaVals)
    val acLu = buildEncodeTable(AcLumaBits, AcLumaVals)
    val dcCh = if (gray) null else buildEncodeTable(DcChromaBits, DcChromaVals)
    val acCh = if (gray) null else buildEncodeTable(AcChromaBits, AcChromaVals)

    val bw = new BitWriter(out)
    val planes = if (gray) Array(y) else Array(y, cb, cr)
    val pred = new Array[Int](nc)
    val mcusX = width / 8
    val mcusY = height / 8
    var mcu = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < nc) {
          val plane = planes(c)
          val q = if (c == 0) qLuma else qChroma
          val block = new Array[Double](64)
          var i = 0
          while (i < 64) {
            val px = plane((my * 8 + i / 8) * width + mx * 8 + i % 8)
            require(px >= 0 && px <= 255, s"sample $px out of 8-bit range")
            block(i) = px - 128.0
            i += 1
          }
          val coef = fdct(block)
          val zz = new Array[Int](64)
          var k = 0
          while (k < 64) {
            zz(k) = math.round(coef(Zigzag(k)) / q(Zigzag(k))).toInt
            k += 1
          }
          // DC
          val (dcTab, acTab) = if (c == 0) (dcLu, acLu) else (dcCh, acCh)
          val diff = zz(0) - pred(c)
          pred(c) = zz(0)
          val cat = category(diff)
          val (code, len) = dcTab(cat)
          bw.write(code, len)
          if (cat > 0)
            bw.write(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
          // AC: run/size with ZRL and EOB
          var run = 0
          k = 1
          while (k < 64) {
            if (zz(k) == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acTab(0xf0); bw.write(zc, zl); run -= 16
              }
              val acat = category(zz(k))
              val (ac, al) = acTab((run << 4) | acat)
              bw.write(ac, al)
              bw.write(if (zz(k) < 0) zz(k) + (1 << acat) - 1 else zz(k), acat)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acTab(0x00); bw.write(ec, el) }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------------- //
  // Decoder
  // ----------------------------------------------------------------- //

  private final case class Component(id: Int, qTable: Int,
      var dcTable: Int, var acTable: Int)

  def decode(bytes: Array[Byte]): JpegImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "missing SOI marker")
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    var width = 0
    var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    var pixels: Array[Int] = null

    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    var done = false
    while (!done) {
      require(pos + 2 <= bytes.length, "truncated before marker")
      // T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
      // fill bytes — advance to the last 0xFF so `m` is the marker id,
      // not another fill byte misread as a length-prefixed segment
      while (pos + 2 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => done = true // EOI
        case 0xdb => // DQT — possibly several tables per segment
          val len = u16(pos); val end = pos + len
          var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(tq < 4, s"DQT table id $tq")
            p += 1
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              val v = if (pq == 0) bytes(p) & 0xff else u16(p)
              t(Zigzag(k)) = v
              p += (if (pq == 0) 1 else 2)
              k += 1
            }
            qTables(tq) = t
          }
          pos = end
        case 0xc4 => // DHT — possibly several tables per segment
          val len = u16(pos); val end = pos + len
          var p = pos + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            require(tc <= 1 && th < 4, s"DHT class $tc id $th")
            p += 1
            val bits = new Array[Int](17)
            var n = 0
            for (l <- 1 to 16) { bits(l) = bytes(p + l - 1) & 0xff; n += bits(l) }
            p += 16
            // loud reject on truncation: copyOfRange would silently
            // zero-pad a short HUFFVAL list into a bogus table
            require(p + n <= end && p + n <= bytes.length, "truncated DHT")
            val vals = java.util.Arrays.copyOfRange(bytes, p, p + n)
            p += n
            val dec = new HuffDecoder(bits, vals)
            if (tc == 0) dcTables(th) = dec else acTables(th) = dec
          }
          pos = end
        case 0xc0 => // SOF0 baseline
          val len = u16(pos)
          require((bytes(pos + 2) & 0xff) == 8, "only 8-bit precision")
          height = u16(pos + 3); width = u16(pos + 5)
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3, s"$nc components (1 or 3 supported)")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            require(hv == 0x11,
              f"sampling 0x$hv%02X — only 4:4:4 (1x1) supported")
            Component(bytes(o) & 0xff, bytes(o + 2) & 0x0f, 0, 0)
          }
          pos += len
        case mm if mm >= 0xc1 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 =>
          throw new IllegalArgumentException(
            f"SOF$mm%x: only baseline sequential (SOF0) supported")
        case 0xdd => // DRI
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda => // SOS — entropy-coded data follows
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          require(comps != null, "SOS before SOF0")
          require(ns == comps.length, "partial scans unsupported")
          for (i <- 0 until ns) {
            val cid = bytes(pos + 3 + 2 * i) & 0xff
            val tt = bytes(pos + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS component $cid"))
            c.dcTable = tt >> 4
            c.acTable = tt & 0x0f
          }
          pos += len
          pixels = decodeScan(bytes, pos, width, height, comps,
            qTables, dcTables, acTables, restartInterval) match {
            case (px, newPos) => pos = newPos; px
          }
        case mm if mm == 0x01 || (mm >= 0xd0 && mm <= 0xd7) =>
          () // TEM / stray RST: standalone markers with no length field
        case _ => // APPn, COM, others: length-prefixed skip
          pos += u16(pos)
      }
    }
    require(pixels != null, "no scan data before EOI")
    JpegImage(width, height, comps.length, pixels)
  }

  /** Decode the single interleaved scan; returns pixels + position of the
    * next marker (EOI).
    */
  private def decodeScan(bytes: Array[Byte], start: Int,
      width: Int, height: Int, comps: Array[Component],
      qTables: Array[Array[Int]], dcTables: Array[HuffDecoder],
      acTables: Array[HuffDecoder], restartInterval: Int): (Array[Int], Int) = {
    val nc = comps.length
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val planes = Array.fill(nc)(new Array[Int](mcusX * 8 * mcusY * 8))
    val in = new BitReader(bytes, start)
    val pred = new Array[Int](nc)
    var mcu = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          in.restart(rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < nc) {
          val comp = comps(c)
          val q = qTables(comp.qTable)
          require(q != null, s"missing DQT table ${comp.qTable}")
          val dcDec = dcTables(comp.dcTable)
          val acDec = acTables(comp.acTable)
          require(dcDec != null && acDec != null, "missing DHT table")
          val zz = new Array[Int](64)
          val cat = dcDec.decode(in)
          require(cat <= 11, s"DC category $cat")
          pred(c) += extend(in.receive(cat), cat)
          zz(0) = pred(c)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = acDec.decode(in)
            val run = rs >> 4
            val size = rs & 0x0f
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else eob = true        // EOB
            } else {
              k += run
              require(k < 64, "AC run overruns block")
              zz(k) = extend(in.receive(size), size)
              k += 1
            }
          }
          val coef = new Array[Int](64)
          var kk = 0
          while (kk < 64) {
            coef(Zigzag(kk)) = zz(kk) * q(Zigzag(kk))
            kk += 1
          }
          val sp = idct(coef)
          val plane = planes(c)
          var i = 0
          while (i < 64) {
            val v = sp(i) + 128
            plane((my * 8 + i / 8) * mcusX * 8 + mx * 8 + i % 8) =
              if (v < 0) 0 else if (v > 255) 255 else v
            i += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // convert to 0xRRGGBB, cropping the MCU-padded planes
    val px = new Array[Int](width * height)
    val stride = mcusX * 8
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        val o = yy * stride + xx
        val p =
          if (nc == 1) { val g = planes(0)(o); (g << 16) | (g << 8) | g }
          else ycc2rgb(planes(0)(o), planes(1)(o), planes(2)(o))
        px(yy * width + xx) = p
        xx += 1
      }
      yy += 1
    }
    // skip the trailing partial-byte padding up to the next marker
    var pos = in.pos
    while (pos + 1 < bytes.length &&
      !((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) != 0x00))
      pos += 1
    // spec-legal 0xFF fill-byte runs before the marker (T.81 B.1.1.2):
    // stop at the LAST 0xFF so the outer loop reads the true marker id
    while (pos + 2 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
      pos += 1
    (px, pos)
  }

  /** libjpeg's 2¹⁶ fixed-point YCbCr→RGB — integer arithmetic an SQL
    * oracle reproduces exactly: x >> 16 is floor division by 65536.
    */
  private[functions] def ycc2rgb(y: Int, cb: Int, cr: Int): Int = {
    val cbz = cb - 128
    val crz = cr - 128
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val r = clamp(y + ((91881 * crz + 32768) >> 16))
    val g = clamp(y - ((22554 * cbz + 46802 * crz + 32768) >> 16))
    val b = clamp(y + ((116130 * cbz + 32768) >> 16))
    (r << 16) | (g << 8) | b
  }
}
