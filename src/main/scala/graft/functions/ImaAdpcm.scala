package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** IMA/DVI ADPCM (WAVE format tag 0x0011) encode + decode in pure
  * integer arithmetic — the COMPRESSED-audio counterpart of the video
  * stack's RLE8/MJPEG: 4 bits per sample against PCM's 16, decoded by
  * the public-spec step/index recurrence (step-size table of 89
  * entries, index-adjust table, saturating 16-bit predictor). The whole
  * decoder is exact int math — no floats — so a SQL oracle can fold the
  * identical recurrence over the nibble stream and hash-match every
  * sample.
  *
  * Block layout (mono, the standard WAV framing): each block is a
  * 4-byte header — initial predictor (int16 LE, which IS output sample
  * 0), initial step index (uint8), reserved byte — followed by nibble
  * data, LOW nibble first within each byte. The fmt chunk carries tag
  * 0x0011, bitsPerSample 4, blockAlign = 4 + nibbleBytes, and the
  * samples-per-block extension field; a `fact` chunk declares the total
  * decoded frame count, as compressed WAVs must.
  */
object ImaAdpcm {

  /** Public-spec step-size table (89 entries). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Public-spec index-adjust table for the 3 magnitude bits. */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One ADPCM block: initial predictor (= output sample 0), initial
    * step index, and the 4-bit codes (each 0..15).
    */
  final case class Block(pred0: Short, index0: Int, nibbles: Array[Byte]) {
    require(index0 >= 0 && index0 <= 88, s"index0 $index0 out of range")
    require(nibbles.length % 2 == 0, "nibble count must be even (byte-packed)")
  }

  final case class AdpcmWav(sampleRate: Int, samplesPerBlock: Int,
      blocks: Vector[Block])

  /** Decode one 4-bit code against (pred, index) state — the spec
    * recurrence, exact ints. Returns the new (pred, index).
    */
  def step(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val stepSize = StepTable(index)
    val delta = nibble & 7
    var vpdiff = stepSize >> 3
    if ((delta & 4) != 0) vpdiff += stepSize
    if ((delta & 2) != 0) vpdiff += stepSize >> 1
    if ((delta & 1) != 0) vpdiff += stepSize >> 2
    val p1raw = if ((nibble & 8) != 0) pred - vpdiff else pred + vpdiff
    val p1 = math.max(-32768, math.min(32767, p1raw))
    val x1 = math.max(0, math.min(88, index + IndexTable(delta)))
    (p1, x1)
  }

  /** Decode a block to its PCM samples: pred0 followed by one sample per
    * nibble.
    */
  def decodeBlock(b: Block): Array[Short] = {
    val out = new Array[Short](1 + b.nibbles.length)
    out(0) = b.pred0
    var p: Int = b.pred0
    var x = b.index0
    var i = 0
    while (i < b.nibbles.length) {
      val (p1, x1) = step(p, x, b.nibbles(i) & 0x0f)
      p = p1; x = x1
      out(i + 1) = p.toShort
      i += 1
    }
    out
  }

  /** Serialize mono ADPCM blocks as a format-0x0011 WAV. All blocks must
    * share one nibble count (fixed blockAlign, as the format requires).
    */
  def encodeWav(sampleRate: Int, blocks: Seq[Block]): Array[Byte] = {
    require(blocks.nonEmpty, "at least one block")
    val nNib = blocks.head.nibbles.length
    require(blocks.forall(_.nibbles.length == nNib),
      "all blocks must share the nibble count")
    val blockAlign = 4 + nNib / 2
    val samplesPerBlock = 1 + nNib
    val dataLen = blockAlign * blocks.size
    val buf = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 28 + 12 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x0011) // IMA ADPCM
      .putShort(1)      // mono
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // approx byte rate
      .putShort(blockAlign.toShort)
      .putShort(4)      // bits per (compressed) sample
      .putShort(2)      // cbSize
      .putShort(samplesPerBlock.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4)
      .putInt(samplesPerBlock * blocks.size)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    blocks.foreach { b =>
      buf.putShort(b.pred0).put(b.index0.toByte).put(0.toByte)
      var i = 0
      while (i < nNib) {
        // low nibble first within each byte, per spec
        buf.put(((b.nibbles(i) & 0x0f) | ((b.nibbles(i + 1) & 0x0f) << 4)).toByte)
        i += 2
      }
    }
    buf.array()
  }

  /** Parse a format-0x0011 mono WAV back into blocks. Walks RIFF chunks
    * with word alignment, validates the compressed-format contract
    * (tag, bits=4, fact frame count vs data layout), rejects loudly.
    */
  def decodeWav(bytes: Array[Byte]): AdpcmWav = {
    require(bytes.length >= 12, "not a RIFF file: too short")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "missing RIFF magic")
    buf.getInt()
    require(fourcc() == "WAVE", "not a WAVE form")
    var sampleRate = -1
    var blockAlign = -1
    var samplesPerBlock = -1
    var factFrames = -1
    var blocks: Vector[Block] = null
    // walk ALL chunks to EOF: a fact chunk is spec-legal AFTER data, and
    // early-exit on fmt+data would silently skip its frame-count check
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val len = buf.getInt()
      require(len >= 0 && buf.position() + len <= bytes.length,
        s"chunk $id overruns file")
      val next = buf.position() + len + (len & 1)
      id match {
        case "fmt " =>
          require(len >= 20, "fmt chunk too short for ADPCM")
          val tag = buf.getShort() & 0xffff
          require(tag == 0x0011, f"format tag 0x$tag%04x is not IMA ADPCM")
          val ch = buf.getShort()
          require(ch == 1, s"$ch channels (mono only)")
          sampleRate = buf.getInt()
          buf.getInt() // byte rate
          blockAlign = buf.getShort() & 0xffff
          val bits = buf.getShort() & 0xffff
          require(bits == 4, s"$bits bits per sample (ADPCM is 4)")
          buf.getShort() // cbSize
          samplesPerBlock = buf.getShort() & 0xffff
          require(samplesPerBlock == 1 + (blockAlign - 4) * 2,
            s"samplesPerBlock $samplesPerBlock != layout of blockAlign $blockAlign")
        case "fact" =>
          require(len >= 4, "fact chunk too short")
          factFrames = buf.getInt()
        case "data" =>
          require(blockAlign > 0, "data before fmt")
          require(len % blockAlign == 0,
            s"data length $len not a multiple of blockAlign $blockAlign")
          val bb = Vector.newBuilder[Block]
          val base = buf.position()
          var off = 0
          while (off < len) {
            val pred0 = buf.getShort(base + off)
            val index0 = bytes(base + off + 2) & 0xff
            require(index0 <= 88, s"initial index $index0 out of range")
            val nib = new Array[Byte]((blockAlign - 4) * 2)
            var i = 0
            while (i < blockAlign - 4) {
              val b = bytes(base + off + 4 + i) & 0xff
              nib(2 * i) = (b & 0x0f).toByte
              nib(2 * i + 1) = ((b >> 4) & 0x0f).toByte
              i += 1
            }
            bb += Block(pred0, index0, nib)
            off += blockAlign
          }
          blocks = bb.result()
        case _ => () // skip unknown chunks with word alignment
      }
      buf.position(math.min(next, bytes.length))
    }
    require(sampleRate > 0 && blocks != null, "missing fmt or data chunk")
    if (factFrames >= 0)
      require(factFrames == samplesPerBlock * blocks.size,
        s"fact declares $factFrames frames, layout holds ${samplesPerBlock * blocks.size}")
    AdpcmWav(sampleRate, samplesPerBlock, blocks)
  }
}
