package graft

import graft.functions.{Portable, SentimentLex, VectorOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY.md §5.3): algebraic invariants that must
  * hold for ANY input, checked over ScalaCheck-generated data — the class
  * of bug the fixture oracle can't catch because fixtures exercise one
  * data shape. (Raw Gen + fixed seeds; the scalatest-scalacheck bridge
  * isn't in the offline dependency set.)
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(42L + i))
      .getOrElse(fail(s"generator exhausted at sample $i")))

  private val wordGen = Gen.listOf(Gen.oneOf(
    "fast", "slow", "big", "small", "the", "a", "spark", "join", "x9", ""))

  test("explode + count == sum of array sizes") {
    for (docs <- samples(Gen.listOfN(20, wordGen), 5)) {
      val df = docs.map(_.mkString(" ")).toDF("text")
        .withColumn("toks", Portable.tokens($"text"))
      val exploded = df.select(explode($"toks")).count()
      val summed = df.agg(coalesce(sum(size($"toks")), lit(0L))).as[Long].head()
      assert(exploded === summed)
    }
  }

  test("sentiment rawScore is additive across a neutral boundary token") {
    def score(ws: List[String]): Long =
      Seq(ws.mkString(" ")).toDF("text")
        .select(SentimentLex.rawScore(Portable.tokens($"text"))).as[Long].head()
    for ((a, b) <- samples(Gen.zip(wordGen, wordGen), 5)) {
      val an = a.filter(_.nonEmpty); val bn = b.filter(_.nonEmpty)
      // scoring is context-aware with one-token lookback (negators/
      // boosters), so plain concatenation can interact at the seam; with a
      // neutral non-marker separator the contexts are preserved exactly
      assert(score(an ++ List(".") ++ bn) === score(an) + score(bn))
    }
  }

  test("dot_scaled is symmetric and cosine is bounded") {
    val vecGen = Gen.listOfN(16, Gen.choose(-1.0f, 1.0f))
      .suchThat(_.exists(_ != 0f))
    for ((a, b) <- samples(Gen.zip(vecGen, vecGen), 5)) {
      val r = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(
          VectorOps.dotScaled($"a", $"b").as("ab"),
          VectorOps.dotScaled($"b", $"a").as("ba"),
          VectorOps.cosineFromScaled(
            VectorOps.dotScaled($"a", $"b"),
            VectorOps.normScaled($"a"), VectorOps.normScaled($"b")).as("cos"))
        .collect()(0)
      assert(r.getAs[Long]("ab") === r.getAs[Long]("ba"))
      // 1e-9 slack for the 1e-15 quantization of the scaled-int trick
      assert(math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9)
    }
  }

  test("sqd_long matches the interpreted zip_with form and is symmetric") {
    val vecGen = Gen.listOfN(16, Gen.choose(-2000000L, 2000000L))
    def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.bridge.column(graft.functions.SqdLongExpr(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))
    for ((a, b) <- samples(Gen.zip(vecGen, vecGen), 5)) {
      val r = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(
          native($"a", $"b").as("ab"),
          native($"b", $"a").as("ba"),
          aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, d) => acc + d).as("ref"))
        .collect()(0)
      assert(r.getAs[Long]("ab") === r.getAs[Long]("ref"))
      assert(r.getAs[Long]("ab") === r.getAs[Long]("ba"))
      assert(r.getAs[Long]("ab") >= 0L)
    }
  }

  test("rolling hash changes when any token changes (collision sanity)") {
    val wsGen = Gen.listOfN(5, Gen.alphaNumStr.suchThat(_.nonEmpty))
    for (ws <- samples(wsGen, 5)) {
      val fps = Seq(ws.mkString(" "), (ws.init :+ (ws.last + "z")).mkString(" "))
        .toDF("text")
        .select(Portable.rollingHash(Portable.tokens($"text"))).as[Long].collect()
      assert(fps(0) !== fps(1))
    }
  }

  test("windowed count aggregation is partition invariant") {
    for (offs <- samples(Gen.listOfN(50, Gen.choose(0L, 3600L)), 3)) {
      val rows = offs.map(o => new java.sql.Timestamp(1609459200000L + o * 1000))
        .toDF("ts")
      def agg(parts: Int) = rows.repartition(parts)
        .groupBy(window($"ts", "15 minutes")).agg(count(lit(1)).as("n"))
        .select($"window.start", $"n").orderBy($"start").collect().toSeq
      assert(agg(1) === agg(7))
    }
  }

  test("BMP encode/decode round-trips arbitrary images in both row orders") {
    import graft.functions.BmpImage
    val imgGen = for {
      w <- Gen.choose(1, 17)
      h <- Gen.choose(1, 9)
      topDown <- Gen.oneOf(true, false)
      px <- Gen.listOfN(w * h, Gen.choose(0, 0xffffff))
    } yield (BmpImage.Bmp(w, h, px.toArray), topDown)
    for ((img, topDown) <- samples(imgGen, 25)) {
      val back = BmpImage.decode(BmpImage.encode(img, topDown))
      assert(back.width === img.width)
      assert(back.height === img.height)
      assert(back.pixels.toSeq === img.pixels.toSeq,
        s"w=${img.width} h=${img.height} topDown=$topDown")
    }
  }

  test("WAV encode/decode round-trips arbitrary PCM sample streams") {
    import graft.functions.RiffWav
    val wavGen = for {
      ch <- Gen.choose(1, 4)
      frames <- Gen.choose(0, 200)
      rate <- Gen.oneOf(8000, 16000, 44100)
      xs <- Gen.listOfN(ch * frames,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield RiffWav.Wav(ch, rate, 16, xs.map(_.toShort).toArray)
    for (w <- samples(wavGen, 25)) {
      val back = RiffWav.decode(RiffWav.encode(w))
      assert(back.channels === w.channels)
      assert(back.sampleRate === w.sampleRate)
      assert(back.samples.toSeq === w.samples.toSeq)
    }
  }

  test("AVI encode/parse accounts for arbitrary frame payloads exactly") {
    import graft.functions.RiffAvi
    val aviGen = for {
      w <- Gen.choose(1, 640)
      h <- Gen.choose(1, 480)
      frames <- Gen.listOf(Gen.listOf(Gen.choose(-128, 127))
        .map(_.map(_.toByte).toArray))
    } yield (w, h, frames)
    for ((w, h, frames) <- samples(aviGen, 25)) {
      val m = RiffAvi.parse(RiffAvi.encode(w, h, 33333, frames))
      assert(m.width === w)
      assert(m.height === h)
      assert(m.totalFrames === frames.size)
      assert(m.payloadBytes === frames.map(_.length.toLong).sum)
      assert(m.payloadSum === frames.flatten.map(b => (b & 0xff).toLong).sum)
    }
  }

  test("q120 integer surprisal equals floor(log2(num/den)) for num >= den >= 1") {
    // bitlen(num div den) - 1 == floor(log2(num/den)): verified against the
    // exact rational definition 2^b * den <= num < 2^(b+1) * den
    val genPair = for {
      den <- Gen.choose(1L, 1L << 40)
      num <- Gen.choose(den, 1L << 45)
    } yield (num, den)
    for ((num, den) <- samples(genPair, 200)) {
      val b = java.lang.Long.toBinaryString(num / den).length - 1
      assert(BigInt(num) >= (BigInt(1) << b) * den)
      assert(BigInt(num) < (BigInt(1) << (b + 1)) * den)
    }
  }

  test("ustar archives round-trip arbitrary member lists byte-exactly") {
    import graft.functions.Ustar
    val memberGen = for {
      n <- Gen.choose(0, 6)
      sizes <- Gen.listOfN(n, Gen.choose(0, 1200))
    } yield sizes.zipWithIndex.map { case (sz, i) =>
      Ustar.Member(f"m$i%04d.bin",
        Array.tabulate[Byte](sz)(k => ((k * 31 + i * 7) % 251).toByte))
    }
    for (ms <- samples(memberGen, 20)) {
      val back = Ustar.parse(Ustar.encode(ms))
      assert(back.map(_.name) === ms.map(_.name))
      assert(back.forall(e => e.checksumOk && e.magicOk))
      back.zip(ms).foreach { case (e, m) =>
        assert(e.payload.toSeq === m.payload.toSeq)
      }
    }
  }
}
