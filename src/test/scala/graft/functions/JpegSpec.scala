package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Jpeg + RiffAvi's MJPEG path: exact round-trips on the block-constant
  * class (the q203 property, color and grayscale, with and without
  * restart markers), near-exact round-trips on the GENERAL lossy path
  * (gradients and isolated high-frequency coefficients, so run/size AC
  * codes and ZRL are on the exercised grammar, not just EOB), restart-
  * marker wire format, byte stuffing, fixed-point color conversion, and
  * loud rejection of unsupported stream shapes.
  */
class JpegSpec extends AnyFunSuite {

  private val qOnes = Array.fill(64)(1)
  private def qExact(dc: Int) = Array.tabulate(64)(k => if (k == 0) dc else 16)

  /** Block-constant planes from a (bx, by) recurrence. */
  private def flat(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f((i % w) / 8, (i / w) / 8) & 0xff)

  test("block-constant color frames decode EXACTLY (the q203 property)") {
    for (w <- Seq(8, 16, 24); h <- Seq(8, 16); rst <- Seq(0, 1, 2)) {
      val y = flat(w, h)((bx, by) => 30 + 40 * bx + 25 * by)
      val cb = flat(w, h)((bx, by) => 200 - 30 * bx + 10 * by)
      val cr = flat(w, h)((bx, by) => 60 + 15 * bx + 50 * by)
      val bytes = Jpeg.encode(w, h, y, cb, cr, qExact(8), qExact(4), rst)
      val img = Jpeg.decode(bytes)
      assert(img.width === w && img.height === h && img.nComponents === 3)
      val want = Array.tabulate(w * h)(i => Jpeg.ycc2rgb(y(i), cb(i), cr(i)))
      assert(img.pixels.toSeq === want.toSeq, s"${w}x$h rst=$rst")
    }
  }

  test("grayscale frames decode exactly; pixels are replicated gray") {
    val y = flat(16, 8)((bx, by) => 17 + 90 * bx + 33 * by)
    val img = Jpeg.decode(Jpeg.encode(16, 8, y, null, null, qExact(8), null))
    assert(img.nComponents === 1)
    assert(img.pixels.toSeq === y.map(g => (g << 16) | (g << 8) | g).toSeq)
  }

  test("general path: a smooth gradient round-trips within quantize error") {
    val w = 24; val h = 16
    val y = Array.tabulate(w * h)(i => (i % w) * 9 % 256)
    val img = Jpeg.decode(Jpeg.encode(w, h, y, null, null, qOnes, null))
    val maxErr = img.pixels.zip(y).map { case (p, s) =>
      math.abs((p & 0xff) - s)
    }.max
    // unit quant tables: per-coefficient error ≤ 0.5, pixel error small
    assert(maxErr <= 4, s"max pixel error $maxErr")
  }

  test("general path: isolated high-frequency coefficient forces ZRL + run codes") {
    // synthesize pixels as the IDCT of a sparse spectrum — long zero runs
    // between nonzero ACs make the encoder emit ZRL (0xF0) and run/size
    // pairs, and the decoder must walk the same grammar back
    val coef = new Array[Int](64)
    coef(0) = 0
    coef(7 * 8 + 7) = 160 // last zigzag slot: 62 zeros before it
    coef(3) = -96
    val px = Jpeg.idct(coef).map(v => math.max(0, math.min(255, v + 128)))
    val img = Jpeg.decode(Jpeg.encode(8, 8, px, null, null, qOnes, null))
    val maxErr = img.pixels.zip(px).map { case (p, s) =>
      math.abs((p & 0xff) - s)
    }.max
    assert(maxErr <= 4, s"max pixel error $maxErr")
  }

  test("restart markers are on the wire and reset DC prediction") {
    val w = 32; val h = 8 // 4 MCUs
    val y = flat(w, h)((bx, _) => 10 + 60 * bx)
    val bytes = Jpeg.encode(w, h, y, null, null, qExact(8), null, 1)
    // RST0..RST2 appear between the 4 MCUs, in order
    val hex = bytes.map(b => f"${b & 0xff}%02x").mkString
    assert(hex.contains("ffd0") && hex.contains("ffd1") && hex.contains("ffd2"))
    assert(Jpeg.decode(bytes).pixels.toSeq ===
      y.map(g => (g << 16) | (g << 8) | g).toSeq)
  }

  test("0xFF entropy bytes are stuffed and unstuffed transparently") {
    // fixed deterministic sweep: at least one synthesized q203 frame
    // carries a stuffed 0xFF00 inside its scan, and all decode anyway
    var stuffed = 0
    for (doc <- 0L until 40L) {
      val avi = graft.operators.Multimodal.synthAviMjpeg(doc)
      var i = 12
      while (i + 1 < avi.length) {
        if ((avi(i) & 0xff) == 0xff && (avi(i + 1) & 0xff) == 0x00) stuffed += 1
        i += 1
      }
    }
    assert(stuffed > 0, "no stuffed byte in 40 synthesized streams")
  }

  test("MJPEG AVI container round-trips frames and wire sizes") {
    val w = 16; val h = 8
    val frames = Seq.tabulate(3) { f =>
      val y = flat(w, h)((bx, by) => 20 * f + 50 * bx + 30 * by)
      val cb = flat(w, h)((bx, _) => 128 + 3 * f + 10 * bx)
      val cr = flat(w, h)((_, by) => 128 - 5 * f + 20 * by)
      (y, cb, cr, Jpeg.encode(w, h, y, cb, cr, qExact(8), qExact(4)))
    }
    val blob = RiffAvi.encodeMjpeg(w, h, 33333, frames.map(_._4))
    val meta = RiffAvi.parse(blob) // generic walk still reads it
    assert(meta.width === w && meta.totalFrames === 3)
    val strf = RiffAvi.parseStrf(blob)
    assert(strf.compression === RiffAvi.MjpgFourcc && strf.bitCount === 24)
    val v = RiffAvi.decodeMjpegFrames(blob)
    assert(v.frames.size === 3)
    for (((y, cb, cr, jpg), f) <- frames.zipWithIndex) {
      val want = Array.tabulate(w * h)(i => Jpeg.ycc2rgb(y(i), cb(i), cr(i)))
      assert(v.frames(f).toSeq === want.toSeq, s"frame $f")
      assert(v.compBytes(f) === jpg.length)
    }
    // RLE8 and raw-DIB blobs refuse the MJPEG decoder loudly
    intercept[IllegalArgumentException](RiffAvi.decodeMjpegFrames(
      RiffAvi.encodeDib(8, 8, 1000, Seq(Array.fill(64)(0x102030)))))
  }

  test("unsupported stream shapes are rejected loudly") {
    val y = flat(8, 8)((_, _) => 100)
    val ok = Jpeg.encode(8, 8, y, null, null, qExact(8), null)
    // progressive SOF2 in place of SOF0
    val prog = ok.clone()
    val sof = prog.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    prog(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(prog))
    // truncated entropy stream
    intercept[IllegalArgumentException](
      Jpeg.decode(java.util.Arrays.copyOfRange(ok, 0, ok.length - 20)))
    // missing SOI
    intercept[IllegalArgumentException](
      Jpeg.decode(java.util.Arrays.copyOfRange(ok, 2, ok.length)))
    // dimension mismatch between JPEG and AVI header is loud
    intercept[IllegalArgumentException](
      RiffAvi.decodeMjpegFrames(RiffAvi.encodeMjpeg(16, 16, 1000, Seq(ok))))
  }
}
