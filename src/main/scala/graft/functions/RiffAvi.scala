package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** AVI container encode + parse in pure byte arithmetic — the video
  * counterpart of [[RiffWav]]/[[BmpImage]], taking the last multimodal
  * stub as far as it can honestly go without codec libraries: AVI is a
  * RIFF form (`RIFF…'AVI '` with `hdrl`/`movi` LISTs), so the CONTAINER —
  * main header, video stream header, frame chunk walk — parses for real;
  * only the frame PAYLOAD stays opaque (decoding it needs the codec that
  * genuinely isn't in this container, which is also why production
  * pipelines treat video as bytes + container metadata until a GPU
  * decode stage).
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
    * given opaque byte arrays.
    */
  def encode(width: Int, height: Int, usecPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
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
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    val out = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(fourcc("RIFF")).putInt(4 + body.length).put(fourcc("AVI ")).put(body)
    out.array()
  }

  /** Parse the container: header fields from avih, frame chunks counted
    * and their payloads summed from the movi walk. Rejects malformed
    * input loudly; frame payload bytes stay opaque (no codec).
    */
  def parse(bytes: Array[Byte]): AviMeta = {
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
