package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Rle8 + RiffAvi's compressed path: greedy-run round-trips (including
  * the 255-run split the fixture frames never reach), FULL-grammar
  * decode against hand-assembled streams (absolute mode, delta escape,
  * early end-of-bitmap), palette/strf round-trip through the container,
  * and truncation rejection.
  */
class Rle8Spec extends AnyFunSuite {

  private def frame(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  test("encode/decode round-trips arbitrary index frames") {
    for (w <- Seq(1, 4, 7, 12); h <- Seq(1, 2, 5)) {
      val px = frame(w, h)((x, y) => (x * 31 + y * 7) % 16)
      assert(Rle8.decode(Rle8.encode(px, w, h), w, h).toSeq === px.toSeq,
        s"${w}x$h")
    }
  }

  test("runs longer than 255 split and still round-trip") {
    val w = 600 // one solid row forces a 255 + 255 + 90 run split
    val px = frame(w, 3)((x, y) => if (y == 1) 9 else x / 300)
    val enc = Rle8.encode(px, w, 3)
    assert(Rle8.decode(enc, w, 3).toSeq === px.toSeq)
    // the solid row really did split: three runs of value 9
    assert(enc.sliding(2, 2).count(p => (p(1) & 0xff) == 9) === 3)
  }

  test("compressed size is 2·runs + 2 per row — smaller than raw for runny data") {
    val w = 40
    val px = frame(w, 4)((x, _) => if (x < 13) 3 else 5) // 2 runs per row
    val enc = Rle8.encode(px, w, 4)
    assert(enc.length === 4 * (2 * 2 + 2))
    assert(enc.length < w * 4)
  }

  test("full grammar decodes: absolute mode, delta skip, early EOB") {
    // hand-assembled 6x2 stream, bottom row first:
    //   bottom: run 2×7, absolute [1,2,3] (+pad), run 1×4, EOL
    //   top:    delta right 2 up 0, run 3×9, then EOB (last pixel unwritten)
    val stream = Array[Int](
      2, 7, 0, 3, 1, 2, 3, 0, 1, 4, 0, 0,
      0, 2, 2, 0, 3, 9, 0, 1).map(_.toByte)
    val got = Rle8.decode(stream, 6, 2)
    assert(got.toSeq === Seq[Byte](
      0, 0, 9, 9, 9, 0, // top row: delta left 2 pixels as 0, EOB leaves last 0
      7, 7, 1, 2, 3, 4)) // bottom row
  }

  test("truncated streams and out-of-surface writes are rejected loudly") {
    intercept[IllegalArgumentException](Rle8.decode(Array[Byte](5), 4, 4))
    // run overflows the row surface
    intercept[IllegalArgumentException](
      Rle8.decode(Array[Byte](9, 1, 0, 1), 4, 1))
    // absolute mode truncated
    intercept[IllegalArgumentException](
      Rle8.decode(Array[Byte](0, 4, 1, 2), 8, 1))
  }

  test("encodeRle8/decodeRle8Frames round-trips pixels, palette and sizes") {
    val palette = Array.tabulate(16)(j => (j * 17 << 16) | (j * 5 << 8) | j)
    for (w <- Seq(4, 9); h <- Seq(2, 5)) {
      val idxFrames = Seq.tabulate(3)(f =>
        frame(w, h)((x, y) => (x + 2 * y + f) % 16))
      val blob = RiffAvi.encodeRle8(w, h, 33333, palette, idxFrames)
      // the generic container walk still reads it
      val meta = RiffAvi.parse(blob)
      assert(meta.width === w && meta.totalFrames === 3)
      val v = RiffAvi.decodeRle8Frames(blob)
      assert(v.width === w && v.height === h && v.usecPerFrame === 33333)
      assert(v.frames.size === 3 && v.compBytes.size === 3)
      for ((idx, f) <- idxFrames.zipWithIndex) {
        val want = idx.map(j => palette(j & 0xff)).toSeq
        assert(v.frames(f).toSeq === want, s"${w}x$h frame $f")
        // wire size agrees with a direct re-encode of the same indices
        assert(v.compBytes(f) === Rle8.encode(idx, w, h).length)
      }
    }
  }

  test("strf parse reads bit depth, compression id and palette order") {
    val palette = Array(0x112233, 0xAABBCC, 0x010203, 0xFF0000)
    val blob = RiffAvi.encodeRle8(4, 2, 1000, palette,
      Seq(frame(4, 2)((x, _) => x % 4)))
    val strf = RiffAvi.parseStrf(blob)
    assert(strf.bitCount === 8 && strf.compression === 1)
    assert(strf.palette.toSeq === palette.toSeq) // B,G,R bytes re-swizzled
    // a raw-DIB blob reports 24-bit uncompressed and no palette
    val dib = RiffAvi.parseStrf(
      RiffAvi.encodeDib(3, 2, 1000, Seq(Array.fill(6)(0x102030))))
    assert(dib.bitCount === 24 && dib.compression === 0)
    assert(dib.palette.isEmpty)
    // raw-DIB frames refuse the RLE decoder loudly
    intercept[IllegalArgumentException](RiffAvi.decodeRle8Frames(
      RiffAvi.encodeDib(3, 2, 1000, Seq(Array.fill(6)(0x102030)))))
  }
}
