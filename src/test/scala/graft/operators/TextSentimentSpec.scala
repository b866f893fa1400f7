package graft.operators

import graft.TestSpark
import graft.functions.{Portable, SentimentLex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the text/sentiment expression surface — the edge cases
  * the reference hits in data (SURVEY.md §5.2): null/empty title+body,
  * suffix-matching regex quirk, lexicon scoring.
  */
class TextSentimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extractTickers: null and empty text yield empty arrays, not nulls") {
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "buy $SPARK and JOIN now"),
      (4L, "customer stream")) // no whitelisted short token
      .toDF("id", "text")
      .withColumn("tickers", TextOps.extractTickers($"text"))
    val got = df.orderBy($"id").collect().map(_.getSeq[String](2).toSet)
    assert(got(0) === Set.empty)
    assert(got(1) === Set.empty)
    assert(got(2) === Set("SPARK", "JOIN"))
    assert(got(3) === Set.empty)
  }

  test("sentiment rawScore sums lexicon milli-valences over tokens") {
    val df = Seq(
      "fast fast slow",    // 2000 + 2000 - 2000
      "great terrible",    // 3100 - 2100
      "unknown words only" // 0
    ).toDF("text")
      .withColumn("raw", SentimentLex.rawScore(Portable.tokens($"text")))
    assert(df.select("raw").as[Long].collect().toSeq === Seq(2000L, 1000L, 0L))
  }

  test("sentiment negation flips and damps by -0.74 (VADER N_SCALAR)") {
    val df = Seq(
      "good",           // 1900
      "not good",       // -74 × 19 = -1406
      "never bad",      // -74 × -25 = 1850
      "not not good"    // only the adjacent negator applies → -1406
    ).toDF("text")
      .withColumn("raw", SentimentLex.rawScore(Portable.tokens($"text")))
    assert(df.select("raw").as[Long].collect().toSeq ===
      Seq(1900L, -1406L, 1850L, -1406L))
  }

  test("sentiment boosters shift magnitude by ±0.293 (VADER B_INCR/B_DECR)") {
    val df = Seq(
      "very good",      // 1900 + 293
      "very bad",       // -2500 - 293
      "slightly good",  // 1900 - 293
      "slightly sorry", // -500 + 293 = -207 (damped toward zero, no flip)
      "VERY GOOD"       // case-insensitive matching
    ).toDF("text")
      .withColumn("raw", SentimentLex.rawScore(Portable.tokens($"text")))
    assert(df.select("raw").as[Long].collect().toSeq ===
      Seq(2193L, -2793L, 1607L, -207L, 2193L))
  }

  test("sentiment multi-clause negation: each clause's negator scopes only its own hit") {
    val df = Seq(
      // two independently negated clauses: -74×19 + -74×-25 = -1406 + 1850
      "not good and never bad",
      // negation then boost in separate clauses: -1406 + (3100 + 293)
      "not good but very great",
      // "so" intensifies good (negator out of lookback scope); "that"
      // breaks never's scope: (1900 + 293) + (-2500)
      "not so good and never that bad",
      // clause break resets context: negator before a non-hit leaves the
      // following clause's hit unmodified ("not today … good" → 1900)
      "not today but good news",
      // three clauses, expanded-lexicon words:
      // -74×26 + (2200 + 293) + -74×-24 = -1924 + 2493 + 1776
      "not lovely yet very fascinating and never nasty"
    ).toDF("text")
      .withColumn("raw", SentimentLex.rawScore(Portable.tokens($"text")))
    assert(df.select("raw").as[Long].collect().toSeq ===
      Seq(444L, 1987L, -307L, 1900L, 2345L))
  }

  test("expanded lexicon: distinct keys, VADER-scale magnitudes, both polarities covered") {
    val words = SentimentLex.Lexicon.map(_._1)
    assert(words.distinct.size === words.size)
    assert(SentimentLex.Lexicon.size >= 2500, s"lexicon shrank: ${words.size}")
    assert(SentimentLex.Lexicon.count(_._2 > 0) >= 1000)
    assert(SentimentLex.Lexicon.count(_._2 < 0) >= 1200)
    // decivalence range matches VADER's [-4, 4] valence band
    assert(SentimentLex.Lexicon.forall { case (_, v) => v >= -40 && v <= 40 })
    // every key must be a clean lowercase token (the lookup lowercases,
    // and the oracle CASE quotes keys with single quotes)
    assert(words.forall(w => w.nonEmpty && w == w.toLowerCase && !w.contains("'")))
    // lookback modifier words must not double as lexicon entries (a word
    // can't be both a hit and the next word's modifier in this design)
    val mods = (SentimentLex.Negations ++ SentimentLex.Intensifiers ++
      SentimentLex.Dampeners).toSet
    assert(words.forall(!mods.contains(_)))
  }

  test("morphological derivation spells standard inflections correctly") {
    import SentimentLex._
    assert(sForm("rally") === "rallies")
    assert(sForm("harass") === "harasses")
    assert(sForm("vex") === "vexes")
    assert(sForm("relish") === "relishes")
    assert(sForm("decay") === "decays")
    assert(pastForm("please") === "pleased")
    assert(pastForm("clarify") === "clarified")
    assert(pastForm("excel") === "excelled")
    assert(pastForm("flop") === "flopped")
    assert(pastForm("abhor") === "abhorred")
    assert(ingForm("embrace") === "embracing")
    assert(ingForm("shun") === "shunning")
    assert(ingForm("decay") === "decaying")
    assert(lyForm("dainty") === "daintily")
    assert(lyForm("majestic") === "majestically")
    assert(lyForm("sensible") === "sensibly")
    assert(lyForm("masterful") === "masterfully")
    // derived entries landed in the merged lexicon with the stem valence
    val lex = Lexicon.toMap
    assert(lex("applauded") === lex("applaud"))
    assert(lex("daintily") === lex("dainty"))
    assert(lex("allies") === lex("ally"))
  }

  test("broad-sample scoring matches hand-computed milli-valences and compounds") {
    // sentences spanning the finance, slang/emoticon, derived-inflection
    // and modifier machinery; expected raws derived by hand from the
    // documented arithmetic (base v*100, negation -74*v, booster ±293)
    val samples = Seq(
      // stonks 15, rallied 17, moon 22, :) 20 — no modifiers
      "stonks rallied to the moon :)" -> (1500L + 1700L + 2200L + 2000L),
      // not bullish → -74*19; bloodbath -22
      "not bullish on this bloodbath" -> (-74L * 19L - 2200L),
      // very stoked → 20*100+293; slightly worried → least(0, -1800+293)
      "very stoked and slightly worried" -> (2293L - 1507L),
      // paperhands -12, panic -23, lol 16
      "paperhands panic selling lol" -> (-1200L - 2300L + 1600L),
      // applauded 17 (derived from applaud), heartwarming 24, rally 17
      "applauded the heartwarming rally" -> (1700L + 2400L + 1700L),
      // daintily 10 (derived), woefully -18 (derived), mediocre -11
      "daintily decorated but woefully mediocre" -> (1000L - 1800L - 1100L),
      // rugpull -23, rekt -21, :( -19
      "total rugpull got rekt :(" -> (-2300L - 2100L - 1900L),
      "" -> 0L)
    val df = samples.map(_._1).toDF("text")
      .withColumn("raw", SentimentLex.rawScore(Portable.tokens($"text")))
      .withColumn("c", SentimentLex.compound($"raw"))
    val got = df.select("raw", "c").as[(Long, Double)].collect()
    got.zip(samples).foreach { case ((raw, c), (text, expected)) =>
      assert(raw === expected, s"raw mismatch on: $text")
      val r = expected.toDouble / 1000.0
      assert(math.abs(c - r / math.sqrt(r * r + 15.0)) < 1e-12, s"compound on: $text")
    }
  }

  test("codegen sentiment expression equals the declarative HOF form on the corpus") {
    val docs = graft.sources.Tables.documents(spark, graft.TestSpark.Sf001)
    val mismatches = docs
      .withColumn("a", SentimentLex.rawScore(Portable.tokens($"text")))
      .withColumn("b", SentimentLex.rawScoreDeclarative(Portable.tokens($"text")))
      .filter($"a" =!= $"b")
      .count()
    assert(mismatches === 0L)
  }

  test("compound normalization is odd, bounded and monotone") {
    val df = Seq(-10L, -1L, 0L, 1L, 10L).toDF("raw")
      .withColumn("c", SentimentLex.compound($"raw"))
    val cs = df.orderBy($"raw").select("c").as[Double].collect()
    assert(cs(2) === 0.0)
    assert(cs.forall(c => c > -1 && c < 1))
    assert(cs.sorted.toSeq === cs.toSeq)     // monotone
    assert(cs(0) === -cs(4) && cs(1) === -cs(3)) // odd symmetry
  }

  test("rolling hash: order-sensitive, deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .withColumn("fp", Portable.rollingHash(Portable.tokens($"text")))
    val fps = df.select("fp").as[Long].collect()
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(1))
  }

  test("md5Hash64 matches a known value (portability anchor)") {
    // first 15 hex chars of md5('hello') = 5d41402abc4b2a7
    val got = Seq("hello").toDF("s")
      .select(Portable.md5Hash64($"s")).as[Long].head()
    assert(got === java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }
}
