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
