package graft.functions

import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal POSIX ustar tar archive writer + parser — the WebDataset shard
  * container (training samples packed as members of plain tar files, read
  * sequentially at training time). Writer and parser implement the POSIX.1
  * ustar layout from scratch: 512-byte headers (NUL-terminated name,
  * octal size/mode/mtime fields, space-initialized checksum, `ustar`
  * magic), block-padded payloads, and the two-zero-block trailer. All
  * fields that could vary run-to-run (mtime, uid/gid, uname) are pinned,
  * so archive bytes are a pure function of the member list — the
  * determinism contract the shard-census oracle depends on.
  *
  * Parser hardening follows the RiffAvi/BmpImage discipline: every size
  * and offset bound is checked in Long arithmetic BEFORE any Int
  * narrowing, so adversarial headers fail the `require`, not an array
  * bounds exception.
  */
object Ustar {

  /** One file to pack: member name (≤ 100 ASCII bytes) + payload. */
  final case class Member(name: String, payload: Array[Byte])

  /** One parsed member: header fields plus whether the stored header
    * checksum and magic matched what the parser recomputed.
    */
  final case class Entry(
      name: String,
      size: Int,
      checksumOk: Boolean,
      magicOk: Boolean,
      payload: Array[Byte])

  private val Block = 512

  /** Pack `members` into a deterministic ustar archive. */
  def encode(members: Seq[Member]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      out.write(header(m.name, m.payload.length))
      out.write(m.payload)
      out.write(new Array[Byte]((Block - m.payload.length % Block) % Block))
    }
    out.write(new Array[Byte](2 * Block)) // end-of-archive trailer
    out.toByteArray
  }

  private def putAscii(h: Array[Byte], off: Int, s: String): Unit = {
    val b = s.getBytes(US_ASCII)
    System.arraycopy(b, 0, h, off, b.length)
  }

  /** Zero-padded octal with trailing NUL, `width` bytes total. */
  private def octal(v: Long, width: Int): String = {
    require(v >= 0, s"octal field must be non-negative, got $v")
    val digits = java.lang.Long.toOctalString(v)
    require(digits.length <= width - 1, s"value $v overflows $width-byte octal field")
    ("0" * (width - 1 - digits.length)) + digits + "\u0000"
  }

  private def header(name: String, size: Int): Array[Byte] = {
    val nameBytes = name.getBytes(US_ASCII)
    require(nameBytes.length <= 100, s"member name exceeds 100 bytes: $name")
    val h = new Array[Byte](Block)
    putAscii(h, 0, name)
    putAscii(h, 100, octal(0x1a4, 8)) // mode 0644
    putAscii(h, 108, octal(0, 8)) // uid
    putAscii(h, 116, octal(0, 8)) // gid
    putAscii(h, 124, octal(size.toLong, 12))
    putAscii(h, 136, octal(0, 12)) // mtime pinned to epoch: determinism
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum computed as spaces
    h(156) = '0' // typeflag: regular file
    putAscii(h, 257, "ustar\u0000")
    putAscii(h, 263, "00")
    var sum = 0
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    val digits = java.lang.Integer.toOctalString(sum)
    putAscii(h, 148, ("0" * (6 - digits.length)) + digits + "\u0000 ")
    h
  }

  /** Octal field parse: digits until NUL/space, Long to defer narrowing. */
  private def parseOctal(bytes: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L
    var i = off
    val end = off + width
    while (i < end && bytes(i) != 0 && bytes(i) != ' '.toByte) {
      val d = bytes(i) - '0'
      require(d >= 0 && d <= 7, s"non-octal digit in header field at $i")
      require(v <= (Long.MaxValue - d) / 8, "octal field overflows Long")
      v = v * 8 + d
      i += 1
    }
    v
  }

  private def allZero(bytes: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + Block) { if (bytes(i) != 0) return false; i += 1 }
    true
  }

  /** Walk the archive, verifying each header's checksum and magic. */
  def parse(bytes: Array[Byte]): Seq[Entry] = {
    require(bytes.length % Block == 0, "tar length must be block-aligned")
    val out = Seq.newBuilder[Entry]
    var off = 0
    var done = false
    while (!done) {
      require(off + Block <= bytes.length, "archive truncated before trailer")
      if (allZero(bytes, off)) done = true
      else {
        var nameLen = 0
        while (nameLen < 100 && bytes(off + nameLen) != 0) nameLen += 1
        val name = new String(bytes, off, nameLen, US_ASCII)
        val size = parseOctal(bytes, off + 124, 12)
        val stored = parseOctal(bytes, off + 148, 8)
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) 32 else bytes(off + i) & 0xff)
          i += 1
        }
        val magicOk = bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' &&
          bytes(off + 261) == 'r'
        val dataOff = off + Block
        require(size <= Int.MaxValue.toLong &&
          dataOff.toLong + size <= bytes.length.toLong,
          s"member '$name' declares $size bytes past end of archive")
        val payload =
          java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size.toInt)
        out += Entry(name, size.toInt, stored == sum, magicOk, payload)
        off = dataOff + ((size.toInt + Block - 1) / Block) * Block
      }
    }
    out.result()
  }
}
