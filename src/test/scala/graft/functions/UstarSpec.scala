package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Ustar: encode/parse round-trip across block-boundary payload sizes,
  * POSIX header field layout, checksum tamper detection, malformed-input
  * rejection, and — when a system `tar` binary exists — a cross-check
  * that a real tar implementation lists our archives.
  */
class UstarSpec extends AnyFunSuite {
  import Ustar._

  private def ascii(s: String) = s.getBytes("US-ASCII")

  private val members = Seq(
    Member("a.txt", ascii("hello tar")),
    Member("empty.txt", Array.emptyByteArray),
    Member("block511.txt", Array.tabulate[Byte](511)(i => (i % 97).toByte)),
    Member("block512.txt", Array.tabulate[Byte](512)(i => (i % 89).toByte)),
    Member("block513.txt", Array.tabulate[Byte](513)(i => (i % 83).toByte)))

  test("encode/parse round-trips names, sizes, payloads; all verify") {
    val tar = encode(members)
    assert(tar.length % 512 === 0)
    // 2 trailer blocks + per member a header block + padded payload
    val expected = 1024 + members.map(m => 512 + ((m.payload.length + 511) / 512) * 512).sum
    assert(tar.length === expected)
    val back = parse(tar)
    assert(back.map(_.name) === members.map(_.name))
    assert(back.map(_.size) === members.map(_.payload.length))
    back.zip(members).foreach { case (e, m) =>
      assert(e.payload.toSeq === m.payload.toSeq)
      assert(e.checksumOk && e.magicOk)
    }
  }

  test("header fields sit at their POSIX offsets") {
    val tar = encode(Seq(Member("name.txt", ascii("xyz"))))
    // size field at 124: 11 octal digits + NUL; payload is 3 bytes
    assert(new String(tar, 124, 11, "US-ASCII") === "00000000003")
    assert(tar(135) === 0)
    // magic "ustar" NUL + version "00" at 257
    assert(new String(tar, 257, 5, "US-ASCII") === "ustar")
    assert(tar(262) === 0)
    assert(new String(tar, 263, 2, "US-ASCII") === "00")
    // typeflag regular file
    assert(tar(156) === '0'.toByte)
    // mode 0644
    assert(new String(tar, 100, 7, "US-ASCII") === "0000644")
  }

  test("header tamper breaks the stored checksum; payload stays payload") {
    val tar = encode(Seq(Member("t.txt", ascii("payload here"))))
    val bad = tar.clone()
    bad(0) = 'x'.toByte // flip a name byte inside the checksummed header
    val e = parse(bad).head
    assert(!e.checksumOk)
    assert(e.magicOk)
    // payload bytes are NOT covered by the header checksum
    val bad2 = tar.clone()
    bad2(512) = 'X'.toByte
    val e2 = parse(bad2).head
    assert(e2.checksumOk)
    assert(e2.payload.head === 'X'.toByte)
  }

  test("malformed archives are rejected loudly") {
    intercept[IllegalArgumentException](parse(Array[Byte](1, 2, 3)))
    // header that declares a size past the end of the archive
    val tar = encode(Seq(Member("t.txt", ascii("abc"))))
    val lying = tar.clone()
    // size field := 00000010000 (octal) = 4096 bytes, archive has none left
    System.arraycopy(ascii("00000010000"), 0, lying, 124, 11)
    intercept[IllegalArgumentException](parse(lying))
    // archive truncated before the zero-block trailer
    intercept[IllegalArgumentException](parse(tar.take(1024)))
  }

  test("a real tar implementation lists and extracts our archive") {
    import scala.sys.process._
    val tarBin = Seq("sh", "-c", "command -v tar").lazyLines_!.headOption
    assume(tarBin.nonEmpty, "no system tar available")
    val f = java.io.File.createTempFile("ustar", ".tar")
    try {
      val fos = new java.io.FileOutputStream(f)
      fos.write(encode(members)); fos.close()
      val listed = Seq("tar", "-tf", f.getPath).lazyLines_!.toList
      assert(listed === members.map(_.name).toList)
      // !! normalizes a trailing newline onto stdout; compare trimmed
      val content = Seq("tar", "-xOf", f.getPath, "a.txt").!!
      assert(content.stripLineEnd === "hello tar")
    } finally f.delete()
  }

  test("md5Hash64Jvm matches the Portable column twin's definition") {
    // first 15 hex digits of md5, base-16 → positive long
    assert(Portable.md5Hash64Jvm("") ===
      java.lang.Long.parseLong("d41d8cd98f00b20", 16))
    assert(Portable.md5Hash64Jvm("hello tar") > 0)
  }
}
