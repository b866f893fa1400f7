package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RiffWav: encode/decode round-trip, real-world chunk layouts the
  * fixture blobs never produce (extra chunks, word alignment), and
  * malformed-input rejection.
  */
class RiffWavSpec extends AnyFunSuite {
  import RiffWav._

  private val stereo = Wav(2, 44100, 16,
    Array[Short](0, 100, -100, 32767, -32768, 7, -7, 1))

  test("encode/decode round-trips header fields and every sample") {
    val back = decode(encode(stereo))
    assert(back.channels === 2)
    assert(back.sampleRate === 44100)
    assert(back.bitsPerSample === 16)
    assert(back.samples.toSeq === stereo.samples.toSeq)
  }

  test("unknown chunks before fmt/data are skipped with word alignment") {
    val base = encode(Wav(1, 8000, 16, Array[Short](5, -5, 9)))
    // splice a 3-byte (odd → padded) junk chunk right after "WAVE"
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // 3-len + pad byte
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val riffLen = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    val got = decode(spliced)
    assert(got.sampleRate === 8000)
    assert(got.samples.toSeq === Seq[Short](5, -5, 9))
  }

  test("malformed inputs are rejected loudly") {
    intercept[IllegalArgumentException](decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](decode("RIFX1234WAVE".getBytes))
    // truncate mid-data
    val short = encode(stereo).dropRight(5)
    intercept[IllegalArgumentException](decode(short))
    // non-PCM format code
    val nonPcm = encode(stereo)
    nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](decode(nonPcm))
  }

  test("synthWav blobs are spec-conforming WAVs with the documented params") {
    import graft.operators.Multimodal
    Seq(0L, 1L, 7L, 4999L).foreach { id =>
      val w = decode(Multimodal.synthWav(id))
      assert(w.channels === 1 + id % 2)
      assert(w.sampleRate === 8000)
      assert(w.samples.length === (200 + id % 800) * w.channels)
    }
  }
}
