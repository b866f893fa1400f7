package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** AVI container encode + parse in pure byte arithmetic — the video
  * counterpart of [[RiffWav]]/[[BmpImage]]. AVI is a RIFF form
  * (`RIFF…'AVI '` with `hdrl`/`movi` LISTs); the CONTAINER — main
  * header, video stream header, frame chunk walk — parses for real, and
  * for the one codec-free video format, UNCOMPRESSED raw-DIB frames
  * (`00db` chunks carrying 24-bit BGR pixel rows, bottom-up,
  * 4-byte-aligned stride — the same device-independent-bitmap layout a
  * BMP pixel array uses), the frame PAYLOAD decodes for real too
  * ([[encodeDib]]/[[decodeFrames]]). Compressed streams decode too for
  * two codecs rebuilt from scratch: BI_RLE8 — the BMP spec's own
  * run-length mode ([[Rle8]], [[encodeRle8]]/[[decodeRle8Frames]]) —
  * and MJPEG, whose `00dc` payloads are complete baseline JFIF streams
  * decoded by [[Jpeg]] ([[encodeMjpeg]]/[[decodeMjpegFrames]]).
  * Inter-frame codecs (H.264 etc.) stay opaque container chunks, which
  * is how production pipelines treat them until a GPU decode stage.
  *
  * Structure handled (the canonical single-video-stream layout):
  *   RIFF <size> 'AVI '
  *     LIST <size> 'hdrl'
  *       'avih' 56: µs/frame, maxBytesPerSec, padding, flags,
  *                  totalFrames, initialFrames, streams, bufSize,
  *                  width, height, reserved[4]
  *       LIST <size> 'strl' ('strh' 'vids' … + 'strf' BITMAPINFOHEADER)
  *     LIST <size> 'movi'
  *       '00dc'/'00db' <len> <frame bytes> (word-aligned)  × totalFrames
  * Unknown chunks (JUNK, INFO, idx1) are skipped with RIFF word
  * alignment, like real readers.
  */
object RiffAvi {

  final case class AviMeta(
      width: Int,
      height: Int,
      usecPerFrame: Int,
      totalFrames: Int,
      /** '00dc'/'00db' chunks actually present in movi */
      frameChunks: Int,
      /** summed payload length across frame chunks */
      payloadBytes: Long,
      /** Σ over payload bytes (unsigned) — an order-blind content check */
      payloadSum: Long)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Serialize a single-'vids'-stream AVI whose frame payloads are the
    * given opaque byte arrays (compressed-stream shape, `00dc` chunks).
    */
  def encode(width: Int, height: Int, usecPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] =
    encodeChunks(width, height, usecPerFrame, frames, "00dc")

  private def encodeChunks(width: Int, height: Int, usecPerFrame: Int,
      frames: Seq[Array[Byte]], frameChunkId: String,
      bitCount: Int = 24, compression: Int = 0,
      palette: Array[Int] = Array.emptyIntArray): Array[Byte] = {
    val strf = {
      // BITMAPINFOHEADER + (for 8-bit) the RGBQUAD palette: B,G,R,0
      val b = ByteBuffer.allocate(40 + 4 * palette.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height).putShort(1)
        .putShort(bitCount.toShort)
        .putInt(compression).putInt(width * height * (bitCount / 8))
        .putInt(2835).putInt(2835)
        .putInt(palette.length).putInt(0)
      palette.foreach { rgb =>
        b.put((rgb & 0xff).toByte)          // B
          .put(((rgb >> 8) & 0xff).toByte)  // G
          .put(((rgb >> 16) & 0xff).toByte) // R
          .put(0.toByte)
      }
      b.array()
    }
    val codec =
      if (compression == 1) "mrle"
      else if (compression == MjpgFourcc) "MJPG"
      else "RAW "
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc(codec)).putInt(0)
        .putShort(0).putShort(0).putInt(0)
        .putInt(usecPerFrame)  // scale
        .putInt(1000000)       // rate → fps = rate/scale
        .putInt(0).putInt(frames.size).putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      b.array()
    }
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usecPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(frames.size).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val b = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc(id)).putInt(body.length).put(body)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("LIST")).putInt(4 + body.length).put(fourcc(kind)).put(body)
      b.array()
    }
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val movi = list("movi", frames.toArray.flatMap(f => chunk(frameChunkId, f)))
    val body = hdrl ++ movi
    val out = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(fourcc("RIFF")).putInt(4 + body.length).put(fourcc("AVI ")).put(body)
    out.array()
  }

  /** Parse the container: header fields from avih, frame chunks counted
    * and their payloads summed from the movi walk. Rejects malformed
    * input loudly; frame payload bytes stay opaque (no codec).
    */
  def parse(bytes: Array[Byte]): AviMeta = walkCore(bytes, null)

  /** One decoded raw-DIB video: header fields plus per-frame pixel
    * arrays (0xRRGGBB ints, row-major, row 0 = TOP row — stored order in
    * the file is bottom-up, as DIB mandates).
    */
  final case class DibVideo(
      width: Int, height: Int, usecPerFrame: Int, frames: Vector[Array[Int]])

  private def dibStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** Decode a raw-DIB AVI END TO END: the container walk of [[parse]]
    * plus a genuine frame-payload decode for every `00db` chunk —
    * 24-bit BGR triples, 4-byte-aligned row stride, bottom-up row order
    * flipped to top-down pixels. A compressed (`00dc`) frame is a loud
    * error: raw DIB is the one video format honestly decodable without
    * codec libraries.
    */
  def decodeFrames(bytes: Array[Byte]): DibVideo = {
    val frames = Vector.newBuilder[Array[Int]]
    val meta = walkCore(bytes, (id, off, len, w, h) => {
      require(id.endsWith("db"),
        s"frame chunk $id is compressed; only raw-DIB 00db decodes here")
      require(w > 0 && h > 0, "frame chunk before avih header")
      val st = dibStride(w)
      require(len == st * h,
        s"DIB payload $len != stride($st) x height($h)")
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val srcRow = h - 1 - y // stored bottom-up
        var x = 0
        while (x < w) {
          val o = off + srcRow * st + x * 3
          val b = bytes(o) & 0xff
          val g = bytes(o + 1) & 0xff
          val r = bytes(o + 2) & 0xff
          px(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      frames += px
    })
    DibVideo(meta.width, meta.height, meta.usecPerFrame, frames.result())
  }

  /** Serialize raw-DIB frames: pixel arrays (0xRRGGBB, row 0 = top)
    * become `00db` chunks in BGR bottom-up stride-padded layout — the
    * exact inverse of [[decodeFrames]]; [[parse]] reads the result too.
    */
  def encodeDib(width: Int, height: Int, usecPerFrame: Int,
      frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.forall(_.length == width * height),
      "every frame must be width x height pixels")
    val st = dibStride(width)
    val frameBytes = frames.map { px =>
      val out = new Array[Byte](st * height) // stride tail stays zeroed
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y
        var x = 0
        while (x < width) {
          val p = px(srcRow * width + x)
          val o = y * st + x * 3
          out(o) = (p & 0xff).toByte
          out(o + 1) = ((p >> 8) & 0xff).toByte
          out(o + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }
    encodeChunks(width, height, usecPerFrame, frameBytes, "00db")
  }

  /** Video stream format from the strl's strf chunk: bit depth, DIB
    * compression id (0 = raw, 1 = BI_RLE8) and, for palettized depths,
    * the color table as 0xRRGGBB ints.
    */
  final case class StrfInfo(bitCount: Int, compression: Int, palette: Array[Int])

  /** Extract the video strf BITMAPINFOHEADER (+ palette) — the header the
    * frame decoders key on. A dedicated scan because the frame walk needs
    * the palette BEFORE it reaches movi.
    */
  def parseStrf(bytes: Array[Byte]): StrfInfo = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def cc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12 && cc() == "RIFF", "not a RIFF file")
    buf.getInt()
    require(cc() == "AVI ", "not an AVI form")
    var found: StrfInfo = null
    def walk(end: Int): Unit = {
      while (found == null && buf.position() + 8 <= end) {
        val id = cc()
        val len = buf.getInt()
        require(len >= 0 && buf.position().toLong + len <= end,
          s"chunk $id overruns file")
        val next = buf.position() + len + (len & 1)
        id match {
          case "LIST" =>
            val kind = cc()
            if (kind == "hdrl" || kind == "strl")
              walk(buf.position() + len - 4)
          case "strf" =>
            require(len >= 40, "strf too short for BITMAPINFOHEADER")
            val p = buf.position()
            val bitCount = buf.getShort(p + 14) & 0xffff
            val compression = buf.getInt(p + 16)
            val declaredColors = buf.getInt(p + 32)
            val nColors =
              if (bitCount == 8) {
                val n = if (declaredColors > 0) declaredColors else 256
                require(40 + 4 * n <= len, "strf palette truncated")
                n
              } else 0
            val palette = new Array[Int](nColors)
            var j = 0
            while (j < nColors) {
              val o = p + 40 + 4 * j
              palette(j) = ((bytes(o + 2) & 0xff) << 16) |
                ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
              j += 1
            }
            found = StrfInfo(bitCount, compression, palette)
          case _ => ()
        }
        buf.position(math.min(next, end))
      }
    }
    walk(bytes.length)
    require(found != null, "no strf chunk")
    found
  }

  /** One decoded RLE8 video: per-frame pixels (0xRRGGBB via the strf
    * palette, row 0 = top) plus each frame's COMPRESSED payload size —
    * the number the compression-ratio audit reads straight off the wire.
    */
  final case class Rle8Video(width: Int, height: Int, usecPerFrame: Int,
      frames: Vector[Array[Int]], compBytes: Vector[Int])

  /** Decode a BI_RLE8 AVI end to end: container walk + [[Rle8.decode]]
    * of every `00dc` payload + palette lookup. The compressed-payload
    * format that used to be this container's one opaque spot.
    */
  def decodeRle8Frames(bytes: Array[Byte]): Rle8Video = {
    val strf = parseStrf(bytes)
    require(strf.bitCount == 8 && strf.compression == 1,
      s"not a BI_RLE8 stream (bits=${strf.bitCount} comp=${strf.compression})")
    val frames = Vector.newBuilder[Array[Int]]
    val lens = Vector.newBuilder[Int]
    val meta = walkCore(bytes, (id, off, len, w, h) => {
      require(id.endsWith("dc"),
        s"frame chunk $id is uncompressed; raw DIB decodes via decodeFrames")
      require(w > 0 && h > 0, "frame chunk before avih header")
      val idx = Rle8.decode(java.util.Arrays.copyOfRange(bytes, off, off + len), w, h)
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) {
        val j = idx(i) & 0xff
        require(j < strf.palette.length, s"palette index $j out of range")
        px(i) = strf.palette(j)
        i += 1
      }
      frames += px
      lens += len
    })
    Rle8Video(meta.width, meta.height, meta.usecPerFrame,
      frames.result(), lens.result())
  }

  /** Serialize RLE8 frames: top-down palette-index arrays become
    * [[Rle8.encode]]d `00dc` chunks behind an 8-bit BI_RLE8 strf carrying
    * the palette — the exact inverse of [[decodeRle8Frames]]; [[parse]]
    * walks the result too.
    */
  def encodeRle8(width: Int, height: Int, usecPerFrame: Int,
      palette: Array[Int], frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == width * height),
      "every frame must be width x height indices")
    val payloads = frames.map(Rle8.encode(_, width, height))
    encodeChunks(width, height, usecPerFrame, payloads, "00dc",
      bitCount = 8, compression = 1, palette = palette)
  }

  /** 'MJPG' as the little-endian BITMAPINFOHEADER biCompression int. */
  private[functions] val MjpgFourcc: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** One decoded MJPEG video: per-frame pixels (0xRRGGBB, row 0 = top)
    * plus each frame's COMPRESSED payload size straight off the wire.
    */
  final case class MjpegVideo(width: Int, height: Int, usecPerFrame: Int,
      frames: Vector[Array[Int]], compBytes: Vector[Int])

  /** Serialize MJPEG frames: each element is a complete baseline JFIF
    * byte stream (one [[Jpeg.encode]] output per frame) wrapped in
    * `00dc` chunks behind a 24-bit 'MJPG'-compression strf — the
    * standard motion-JPEG-in-AVI layout; [[parse]] walks the result too.
    */
  def encodeMjpeg(width: Int, height: Int, usecPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] =
    encodeChunks(width, height, usecPerFrame, frames, "00dc",
      bitCount = 24, compression = MjpgFourcc)

  /** Decode an MJPEG AVI end to end: container walk + a full baseline
    * JPEG decode ([[Jpeg.decode]]) of every `00dc` payload — marker
    * parse, DHT Huffman tables, dequant, IDCT, YCbCr→RGB. Frame
    * dimensions are cross-checked against the container header: a
    * JPEG/AVI mismatch is a loud error, as in real players.
    */
  def decodeMjpegFrames(bytes: Array[Byte]): MjpegVideo = {
    val strf = parseStrf(bytes)
    require(strf.compression == MjpgFourcc,
      s"not an MJPEG stream (comp=0x${strf.compression.toHexString})")
    val frames = Vector.newBuilder[Array[Int]]
    val lens = Vector.newBuilder[Int]
    val meta = walkCore(bytes, (id, off, len, w, h) => {
      require(id.endsWith("dc"),
        s"frame chunk $id is uncompressed; raw DIB decodes via decodeFrames")
      require(w > 0 && h > 0, "frame chunk before avih header")
      val img = Jpeg.decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
      require(img.width == w && img.height == h,
        s"JPEG ${img.width}x${img.height} != container ${w}x$h")
      frames += img.pixels
      lens += len
    })
    MjpegVideo(meta.width, meta.height, meta.usecPerFrame,
      frames.result(), lens.result())
  }

  private def walkCore(
      bytes: Array[Byte],
      onFrame: (String, Int, Int, Int, Int) => Unit): AviMeta = {
    require(bytes.length >= 12, "not a RIFF file: too short")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def cc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(cc() == "RIFF", "missing RIFF magic")
    buf.getInt() // declared riff size; trailing bytes tolerated
    require(cc() == "AVI ", "not an AVI form")
    var width, height, usec, totalFrames = -1
    var frameChunks = 0
    var payloadBytes = 0L
    var payloadSum = 0L
    def walk(end: Int): Unit = {
      while (buf.position() + 8 <= end) {
        val id = cc()
        val len = buf.getInt()
        // bound check in Long: a declared len near Int.MaxValue must fail
        // here, not wrap negative and surface later as an index error
        require(len >= 0 && buf.position().toLong + len <= end,
          s"chunk $id overruns file")
        val next = buf.position() + len + (len & 1)
        id match {
          case "LIST" =>
            val kind = cc()
            if (kind == "hdrl" || kind == "movi" || kind == "strl")
              walk(buf.position() + len - 4)
          case "avih" =>
            require(len >= 40, "avih too short")
            usec = buf.getInt()
            buf.getInt(); buf.getInt(); buf.getInt()
            totalFrames = buf.getInt()
            buf.getInt(); buf.getInt(); buf.getInt()
            width = buf.getInt()
            height = buf.getInt()
          case f if f.length == 4 && f.charAt(0).isDigit && f.charAt(1).isDigit
              && (f.endsWith("dc") || f.endsWith("db")) =>
            frameChunks += 1
            payloadBytes += len
            var i = 0
            while (i < len) { payloadSum += (bytes(buf.position() + i) & 0xff); i += 1 }
            if (onFrame != null) onFrame(f, buf.position(), len, width, height)
          case _ => () // strh/strf/JUNK/idx1/INFO — skip
        }
        buf.position(math.min(next, end))
      }
    }
    walk(bytes.length)
    require(width > 0 && height > 0, "no avih header")
    require(totalFrames == frameChunks,
      s"header declares $totalFrames frames but movi carries $frameChunks")
    AviMeta(width, height, usec, totalFrames, frameChunks, payloadBytes, payloadSum)
  }
}
