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
  * ([[encodeDib]]/[[decodeFrames]]). Compressed streams (`00dc`) stay
  * opaque bytes — their codecs genuinely aren't in this container, which
  * is how production pipelines treat compressed video until a GPU decode
  * stage.
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
      frames: Seq[Array[Byte]], frameChunkId: String): Array[Byte] = {
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .putInt(0).putInt(width * height * 3).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc("RAW ")).putInt(0)
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
