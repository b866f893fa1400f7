package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/WAV (PCM) encode + decode in pure byte arithmetic — a REAL
  * decoder for the one mainstream media container that needs no codec
  * library, upgrading the multimodal DECODE step from "documented stub"
  * to executed code for audio (SURVEY.md §7.2 multimodal plumbing). The
  * parser walks RIFF chunks properly (fmt /data discovery, word-aligned
  * chunk skipping, trailing-chunk tolerance), so it decodes any
  * spec-conforming 16-bit PCM WAV, not just the fixture's synthesized
  * blobs. Images/video stay stubbed (their codecs genuinely aren't in
  * the container).
  */
object RiffWav {

  final case class Wav(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      /** interleaved 16-bit samples */
      samples: Array[Short])

  /** Serialize 16-bit PCM to a standard 44-byte-header WAV blob. */
  def encode(w: Wav): Array[Byte] = {
    require(w.bitsPerSample == 16, "16-bit PCM only")
    val dataLen = w.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    val byteRate = w.sampleRate * w.channels * 2
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(w.channels.toShort)
      .putInt(w.sampleRate)
      .putInt(byteRate)
      .putShort((w.channels * 2).toShort) // block align
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    w.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a PCM WAV blob: walks the RIFF chunk list to find fmt /data
    * (skipping unknown chunks with RIFF's word alignment), validates the
    * PCM/16-bit contract, and materializes the sample frames. Rejects
    * malformed input loudly.
    */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, "not a RIFF file: too short")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "missing RIFF magic")
    buf.getInt() // declared riff size; trailing bytes tolerated like real readers
    require(fourcc() == "WAVE", "not a WAVE form")
    var channels, sampleRate, bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || channels < 0)) {
      val id = fourcc()
      val len = buf.getInt()
      require(len >= 0 && len <= buf.remaining(), s"chunk $id overruns file")
      val next = buf.position() + len + (len & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          val audioFormat = buf.getShort()
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt() // byte rate
          buf.getShort() // block align
          bits = buf.getShort()
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          require(len % 2 == 0, "odd data length for 16-bit samples")
          samples = Array.ofDim[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ => () // LIST/INFO/etc — skip
      }
      buf.position(math.min(next, bytes.length))
    }
    require(channels > 0, "no fmt chunk")
    require(samples != null, "no data chunk")
    require(samples.length % channels == 0, "partial final frame")
    Wav(channels, sampleRate, 16, samples)
  }
}
