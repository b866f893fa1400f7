package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** ImaAdpcm: WAV round-trips, spec-recurrence anchors, saturation
  * behavior, and loud rejection of malformed streams.
  */
class ImaAdpcmSpec extends AnyFunSuite {

  private def block(pred0: Int, idx0: Int)(f: Int => Int): ImaAdpcm.Block =
    ImaAdpcm.Block(pred0.toShort, idx0,
      Array.tabulate(32)(i => (f(i) & 0x0f).toByte))

  test("encodeWav/decodeWav round-trips blocks, headers and nibble order") {
    val blocks = Seq(
      block(1234, 40)(i => i % 16),
      block(-2000, 0)(i => (i * 7 + 3) % 16),
      block(32767, 88)(_ => 15))
    val bytes = ImaAdpcm.encodeWav(8000, blocks)
    val wav = ImaAdpcm.decodeWav(bytes)
    assert(wav.sampleRate === 8000)
    assert(wav.samplesPerBlock === 33)
    assert(wav.blocks.size === 3)
    for ((orig, got) <- blocks.zip(wav.blocks)) {
      assert(got.pred0 === orig.pred0)
      assert(got.index0 === orig.index0)
      assert(got.nibbles.toSeq === orig.nibbles.toSeq)
    }
  }

  test("step recurrence: hand-checked spec values") {
    // index 0 → step 7. nibble 0: vpdiff = 7>>3 = 0, index adj -1 → 0
    assert(ImaAdpcm.step(100, 0, 0) === ((100, 0)))
    // nibble 7: vpdiff = 0 + 7 + 3 + 1 = 11, index adj +8
    assert(ImaAdpcm.step(100, 0, 7) === ((111, 8)))
    // nibble 15 = sign | 7: subtract the same magnitude
    assert(ImaAdpcm.step(100, 0, 15) === ((89, 8)))
    // saturation at both rails
    assert(ImaAdpcm.step(32760, 88, 7)._1 === 32767)
    assert(ImaAdpcm.step(-32760, 88, 15)._1 === -32768)
    // index clamps to [0, 88]
    assert(ImaAdpcm.step(0, 0, 3)._2 === 0)
    assert(ImaAdpcm.step(0, 88, 4)._2 === 88)
  }

  test("decodeBlock emits pred0 as sample 0 and one sample per nibble") {
    val b = block(500, 20)(i => (i * 3) % 16)
    val s = ImaAdpcm.decodeBlock(b)
    assert(s.length === 33)
    assert(s(0) === 500)
    // decode is deterministic
    assert(ImaAdpcm.decodeBlock(b).toSeq === s.toSeq)
  }

  test("malformed streams are rejected loudly") {
    val ok = ImaAdpcm.encodeWav(8000, Seq(block(0, 0)(_ => 1)))
    // PCM WAVs refuse the ADPCM decoder
    val pcm = RiffWav.encode(RiffWav.Wav(1, 8000, 16, Array[Short](1, 2, 3)))
    intercept[IllegalArgumentException](ImaAdpcm.decodeWav(pcm))
    // truncated data chunk
    intercept[IllegalArgumentException](ImaAdpcm.decodeWav(
      java.util.Arrays.copyOfRange(ok, 0, ok.length - 5)))
    // corrupt initial index (> 88)
    val bad = ok.clone()
    // data chunk payload starts right after "data"+len; find it
    val dataAt = {
      var i = 0
      while (!(bad(i) == 'd' && bad(i + 1) == 'a' && bad(i + 2) == 't' &&
        bad(i + 3) == 'a')) i += 1
      i + 8
    }
    bad(dataAt + 2) = 120.toByte
    intercept[IllegalArgumentException](ImaAdpcm.decodeWav(bad))
  }
}
