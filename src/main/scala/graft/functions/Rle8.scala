package graft.functions

/** BI_RLE8 — the BMP specification's own 8-bit run-length codec, built
  * from scratch in pure byte arithmetic (the compression= 1 mode of a
  * BITMAPINFOHEADER; also the payload format of Microsoft-RLE `00dc`
  * video frames, which is what finally makes COMPRESSED AVI payloads
  * honestly decodable here — see [[RiffAvi.decodeRle8Frames]]).
  *
  * Stream grammar, per the DIB spec (lines encode BOTTOM-UP like every
  * DIB pixel array):
  *
  *   n c        n > 0: run — repeat palette index c, n times
  *   0 0        end of line (cursor moves to start of next row up)
  *   0 1        end of bitmap
  *   0 2 dx dy  delta — cursor jumps right dx, up dy (skipped pixels
  *              are left as-is; this codec's sparse-update escape)
  *   0 n c...   n ≥ 3: absolute mode — n literal indices follow,
  *              padded to a 16-bit boundary
  *
  * The encoder emits greedy maximal runs (split at 255) and closes every
  * line explicitly — deterministic output bytes for deterministic input,
  * which the oracle's analytic size model relies on. The decoder handles
  * the FULL grammar including absolute and delta modes, so foreign
  * streams decode too (spec-tested against hand-assembled bytes).
  */
object Rle8 {

  /** Encode top-down palette indices (row 0 = top, `width*height` bytes)
    * as an RLE8 stream. Rows are emitted bottom-up, as DIB mandates.
    */
  def encode(indices: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(indices.length == width * height,
      s"${indices.length} indices for ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    var row = height - 1 // bottom-up
    while (row >= 0) {
      val base = row * width
      var x = 0
      while (x < width) {
        var run = 1
        while (x + run < width && run < 255 &&
          indices(base + x + run) == indices(base + x)) run += 1
        out.write(run)
        out.write(indices(base + x) & 0xff)
        x += run
      }
      if (row == 0) { out.write(0); out.write(1) } // end of bitmap
      else { out.write(0); out.write(0) }          // end of line
      row -= 1
    }
    out.toByteArray
  }

  /** Decode an RLE8 stream to top-down palette indices. Pixels never
    * written (delta-skipped or ended early) come back 0 — the spec's
    * "left as-is" over a zeroed surface.
    */
  def decode(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](width * height)
    var row = height - 1 // stream starts at the BOTTOM row
    var x = 0
    var i = 0
    def put(v: Byte): Unit = {
      require(row >= 0 && x < width, s"RLE8 writes outside ${width}x$height")
      out(row * width + x) = v
      x += 1
    }
    var done = false
    while (!done) {
      require(i + 1 < bytes.length, "RLE8 stream truncated")
      val n = bytes(i) & 0xff
      val c = bytes(i + 1) & 0xff
      i += 2
      if (n > 0) {
        var k = 0
        while (k < n) { put(c.toByte); k += 1 }
      } else c match {
        case 0 => row -= 1; x = 0 // end of line: next row UP
        case 1 => done = true     // end of bitmap
        case 2 =>                 // delta: right dx, UP dy
          require(i + 1 < bytes.length, "RLE8 delta truncated")
          x += bytes(i) & 0xff
          row -= bytes(i + 1) & 0xff
          i += 2
        case abs =>               // absolute mode: abs literal indices
          require(i + abs <= bytes.length, "RLE8 absolute run truncated")
          var k = 0
          while (k < abs) { put(bytes(i + k)); k += 1 }
          i += abs + (abs & 1)    // pad to 16-bit boundary
      }
    }
    out
  }
}
