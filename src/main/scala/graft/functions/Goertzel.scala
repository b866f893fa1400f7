package graft.functions

/** Fixed-point Goertzel filter bank — the spectral-band-energy operator
  * of the ASR-prep pipeline (the step between q142's time-domain energy
  * and a full mel filterbank): per analysis frame, the energy near K
  * fixed center frequencies, computed with the 2nd-order Goertzel
  * recurrence instead of an FFT because a handful of bands over a short
  * frame is exactly Goertzel's sweet spot (O(N·K), no twiddle tables,
  * streaming-friendly state of two words per band).
  *
  * Determinism contract (the q210 cosine-table discipline): the only
  * irrational constants — 2·cos(2πf/fs) per band — are scaled to
  * [[Shift]]-bit fixed point and rounded ONCE here at object init; the
  * DuckDB oracle receives the SAME integer literals, and every other
  * operation is int64 arithmetic. The one rounding operation inside the
  * recurrence, floor division by 2^Shift, is written as an arithmetic
  * right shift — Scala's `>>` on Long and DuckDB's `>>` on BIGINT are
  * both arithmetic (floor) shifts, verified, so the whole filter bank is
  * bit-identical across engines.
  *
  * Magnitude bound (no int64 overflow): the marginally-stable resonator
  * has |impulse response| ≤ 1/sin(ω), so |s| ≤ N·max|x|/sin(ω_min);
  * for N = 256 frames of 16-bit audio and the 200 Hz minimum band at
  * fs = 8000 that is ≈ 5·10⁷ — s², the power terms and the c·s products
  * all sit far below 2⁶³.
  *
  * The computed `power` is s1² + s2² − (c·s1 >> Shift)·s2 after the
  * frame — the standard Goertzel magnitude-squared (∝ |X(ω)|²), exact up
  * to the declared fixed-point quantization (which both engines share;
  * tiny signals may quantize to a slightly negative power, which is fine
  * because the contract is bit-equality, not non-negativity).
  */
object Goertzel {
  val SampleRate = 8000
  val Shift = 14
  /** Band centers (Hz): log-ish spacing over the 8 kHz voice band. */
  val BandHz: Seq[Int] = Seq(200, 400, 800, 1200, 1600, 2400, 3200, 3800)
  /** round(2·cos(2πf/fs)·2^Shift) — the literals the oracle embeds. */
  val Coef: Array[Long] = BandHz.map(f =>
    Math.round(2.0 * math.cos(2.0 * math.Pi * f / SampleRate)
      * (1L << Shift))).toArray

  /** Band powers of samples[from, until) — one pass per band. */
  def framePowers(samples: Array[Int], from: Int, until: Int): Array[Long] = {
    val out = new Array[Long](Coef.length)
    var b = 0
    while (b < Coef.length) {
      val c = Coef(b)
      var s1 = 0L
      var s2 = 0L
      var i = from
      while (i < until) {
        val s0 = samples(i) + ((c * s1) >> Shift) - s2
        s2 = s1
        s1 = s0
        i += 1
      }
      out(b) = s1 * s1 + s2 * s2 - ((c * s1) >> Shift) * s2
      b += 1
    }
    out
  }
}
