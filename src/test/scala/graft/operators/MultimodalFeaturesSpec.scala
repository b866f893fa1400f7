package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q141/q142 feature-extraction invariants: the pooled/framed outputs
  * must reconcile exactly with the whole-asset decode they derive from.
  */
class MultimodalFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.Sf001

  test("q141: pooled cells partition the image and reconcile with the q109 whole-image sums") {
    val pool = graft.SparkEntry.queries("q141_image_pool")(spark, dir).cache()
    val img = graft.SparkEntry.queries("q109_bmp_decode")(spark, dir)
      .select($"doc_id", ($"width" * $"height").as("n_px_img"),
        $"sum_r".as("r_img"), $"sum_g".as("g_img"), $"sum_b".as("b_img"))
    // exactly 4 cells per doc, cells partition the pixel set, channel
    // sums reconcile with the whole-image decode
    val agg = pool.groupBy($"doc_id").agg(
      count(lit(1)).as("n_cells"), sum($"n_px").as("n_px"),
      sum($"sum_r").as("r"), sum($"sum_g").as("g"), sum($"sum_b").as("b"))
    val bad = agg.join(img, "doc_id").filter(
      $"n_cells" =!= 4L || $"n_px" =!= $"n_px_img" ||
        $"r" =!= $"r_img" || $"g" =!= $"g_img" || $"b" =!= $"b_img")
    assert(bad.isEmpty)
    // floored means stay inside the byte range and match sum/n
    assert(pool.filter($"mean_r" =!= floor($"sum_r" / $"n_px") ||
      $"mean_r" < 0 || $"mean_r" > 255).isEmpty)
    pool.unpersist()
  }

  test("q142: windows partition the sample stream and reconcile with the q107 whole-clip stats") {
    val win = graft.SparkEntry.queries("q142_audio_energy")(spark, dir).cache()
    val wav = graft.SparkEntry.queries("q107_wav_decode")(spark, dir)
      .select($"doc_id", ($"n_frames" * $"channels").as("n_samp"), $"peak".as("clip_peak"))
    val agg = win.groupBy($"doc_id").agg(
      sum($"n_samples").as("n_samp_w"), max($"peak").as("peak_w"),
      count(lit(1)).as("n_wins"), max($"win_idx").as("max_idx"))
    val bad = agg.join(wav, "doc_id").filter(
      $"n_samp_w" =!= $"n_samp" || $"peak_w" =!= $"clip_peak" ||
        $"n_wins" =!= floor(($"n_samp" + 255) / lit(256)).cast("long") ||
        $"max_idx" =!= $"n_wins" - 1)
    assert(bad.isEmpty)
    // every window except the last is full
    assert(win.join(agg.select($"doc_id", $"max_idx"), "doc_id")
      .filter($"win_idx" < $"max_idx" && $"n_samples" =!= 256L).isEmpty)
    // energy bound: n · peak²
    assert(win.filter($"energy" > $"n_samples" * $"peak" * $"peak").isEmpty)
    win.unpersist()
  }

  test("q210 pHash: brightness-invariant, deterministic, finds only true image families") {
    import graft.functions.BmpImage
    def gray(f: Int => Int): Array[Byte] = BmpImage.encode(BmpImage.Bmp(16, 16,
      Array.tabulate(256) { i => val v = f(i) & 0xff; (v << 16) | (v << 8) | v }))
    // the defining pHash property: a global brightness shift only moves
    // DC, which the hash excludes — identical 63 bits
    val base = gray(i => 20 + (i % 16) * 7 % 120 + (i / 16) * 3 % 60)
    val brighter = gray(i => 60 + (i % 16) * 7 % 120 + (i / 16) * 3 % 60)
    assert(Multimodal.phash64(base) === Multimodal.phash64(brighter))
    // a structurally different image hashes far away
    val other = gray(i => ((i % 16) * (i / 16) * 5) % 200)
    val d = java.lang.Long.bitCount(
      Multimodal.phash64(base) ^ Multimodal.phash64(other))
    assert(d > 6, s"structurally different images only $d bits apart")
    // rerun-deterministic synthesis + full-query sanity: every verified
    // pair is within one synthesis family, at or under the threshold
    assert(Multimodal.phash64(Multimodal.synthPhashBmp(7L)) ===
      Multimodal.phash64(Multimodal.synthPhashBmp(7L)))
    val pairs = graft.SparkEntry.queries("q210_image_phash_dedup")(spark, dir)
      .collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(2) <= 6L))
    assert(pairs.forall(r => r.getLong(0) % 50 === r.getLong(1) % 50))
  }

  test("q217: detected shot boundaries land exactly at the synthesized cuts") {
    val rows = graft.SparkEntry.queries("q217_shot_boundaries")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Long]("frame_idx")
      val expect = if (f == 3L || f == 6L) 1L else 0L
      assert(r.getAs[Long]("is_boundary") === expect,
        s"doc ${r.getAs[Long]("doc_id")} frame $f")
    }
  }

  test("q216: a corrupted shard byte fails member validation on parse-back") {
    import graft.functions.Ustar
    val tar = Ustar.encode(Seq(
      Ustar.Member("000000000001.bmp", Multimodal.synthPhashBmp(1L)),
      Ustar.Member("000000000001.wav", Multimodal.synthAdpcmWav(1L))))
    assert(Ustar.parse(tar).forall(e => e.checksumOk && e.magicOk))
    val bad = tar.clone()
    bad(60) = (bad(60) ^ 0x41).toByte // flip a header byte → checksum breaks
    assert(Ustar.parse(bad).exists(e => !e.checksumOk))
  }

  test("q224: a pure tone at each band center dominates its own band; silence is zero") {
    import graft.functions.Goertzel
    Goertzel.BandHz.zipWithIndex.foreach { case (f, k) =>
      val n = 256
      val xs = Array.tabulate(n)(i =>
        math.round(8000.0 *
          math.sin(2 * math.Pi * f * i / Goertzel.SampleRate)).toInt)
      val p = Goertzel.framePowers(xs, 0, n)
      val argmax = p.indices.maxBy(p)
      assert(argmax === k, s"tone ${f} Hz peaked in band $argmax: ${p.mkString(",")}")
      assert(p(k) > 0L)
    }
    assert(Goertzel.framePowers(Array.fill(256)(0), 0, 256).forall(_ === 0L))
    // the fixed-point magnitude bound the scaladoc claims: the synth
    // noise corpus never approaches int64 territory
    (0L until 50L).foreach { doc =>
      val n = ((200 + doc % 800) * (1 + doc % 2)).toInt
      val xs = Array.tabulate(n)(i =>
        (((doc * 31 + i.toLong * 17) % 2003) - 1001).toInt)
      (0 until (n + 255) / 256).foreach { win =>
        Goertzel.framePowers(xs, win * 256, math.min((win + 1) * 256, n))
          .foreach(p => assert(math.abs(p) < (1L << 50)))
      }
    }
  }
}
