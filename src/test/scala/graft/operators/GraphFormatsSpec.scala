package graft.operators

import graft.{SparkEntry, TestSpark}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the round-7 additions: the ORC round-trip is
  * lossless (q123), batch sessionization satisfies the gaps-and-islands
  * contract (q124), and TextRank is deterministic fixed-point arithmetic
  * (q125).
  */
class GraphFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  test("q123 ORC round-trip: equals the same aggregate computed without the trip") {
    val direct = CoreBatch.goldDaily(spark, TestSpark.Sf001)
      .filter($"volume" > 0)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum(($"close".cast("decimal(28,2)") * 100).cast("long")).as("close_cents"),
        sum($"volume").as("total_volume"),
        max($"date").as("last_date"))
      .orderBy($"event_type")
      .collect().toSeq
    val tripped = run("q123_orc_roundtrip").collect().toSeq
    assert(tripped === direct) // bit-exact: ORC stores typed columns
  }

  test("q124 sessionize: conserves events and never merges across a >30min gap") {
    val sessions = run("q124_batch_sessionize")
    val nEvents = Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull).count()
    assert(sessions.agg(sum($"n_events")).as[Long].head() === nEvents)

    // defining property: consecutive sessions of one user are separated by
    // MORE than the 30-min inactivity threshold (else they'd be one island)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_seq")
    val gaps = sessions
      .withColumn("prev_end", lag($"session_end", 1).over(w))
      .filter($"prev_end".isNotNull)
      .select((unix_micros($"session_start") - unix_micros($"prev_end")).as("gap_us"))
      .as[Long].collect()
    assert(gaps.nonEmpty)
    assert(gaps.forall(_ > 1800L * 1000000L))

    // a single-event session has zero duration by construction
    val singles = sessions.filter($"n_events" === 1)
      .select($"session_secs").as[Long].collect()
    assert(singles.forall(_ === 0L))
  }

  test("q126 zorder: every block bounds BOTH dims to ~1/4 span (the skipping property)") {
    val blocks = run("q126_zorder_layout").collect()
    assert(blocks.nonEmpty && blocks.length <= 16)
    val uSpan = blocks.map(_.getLong(2)).min to blocks.map(_.getLong(3)).max
    val dSpan = blocks.map(_.getLong(4)).min to blocks.map(_.getLong(5)).max
    val uQuarter = (uSpan.max - uSpan.min) / 4 + 2 // +rounding slack
    val dQuarter = (dSpan.max - dSpan.min) / 4 + 2
    blocks.foreach { r =>
      assert(r.getLong(6) <= uQuarter, s"user_span ${r.getLong(6)} > $uQuarter")
      assert(r.getLong(7) <= dQuarter, s"day_span ${r.getLong(7)} > $dQuarter")
    }
    // a date-sorted layout could never do this: its blocks span ALL users
  }

  test("q127 jsonl: equals the same aggregate computed without the trip") {
    val direct = Tables.documents(spark, TestSpark.Sf001)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        sum(graft.functions.Portable.md5Hash64(
          concat($"doc_id".cast("string"), lit("|"), $"text", lit("|"), $"lang"))
          % graft.functions.Portable.P).as("content_hash"))
      .orderBy($"source")
      .collect().toSeq
    val tripped = run("q127_jsonl_roundtrip").collect().toSeq
    assert(tripped === direct) // escaping-lossless for quotes/newlines/unicode
  }

  test("q129 dsir: target-language keep-rate dominates every other language's") {
    val rows = run("q129_dsir_importance")
      .select($"lang", $"kept", $"n_docs").as[(String, Boolean, Long)].collect()
    def rate(lang: String): Double = {
      val kept = rows.collect { case (l, true, c) if l == lang => c }.sum
      val all = rows.collect { case (l, _, c) if l == lang => c }.sum
      kept.toDouble / all
    }
    // the hashed-bigram importance weights must carry real distributional
    // signal: en docs are kept at a multiple of any other language's rate
    // (floor-log quantization keeps absolute rates modest at tiny SF, so
    // the claim is relative, which is also what selection actually uses)
    for (l <- Seq("de", "es", "fr", "zh"))
      assert(rate("en") > 2.0 * rate(l), s"en ${rate("en")} vs $l ${rate(l)}")
  }

  test("q132 incremental merge == full recompute on constructed boundary data") {
    // the fixture's users are too sparse to ever straddle the cutoff
    // within 30 min, so the merge branch gets synthetic coverage: u1's
    // boundary pair fuses (10-min gap), u2's must not (45-min gap), u3 is
    // delta-only, u4 base-only
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val rows = Seq(
      // (user, event, minute, value)
      (1L, 1L, 0L, 1.0), (1L, 2L, 5L, 1.0),     // base u1 session
      (1L, 3L, 70L, 1.0),                       // base u1 boundary session
      (1L, 4L, 80L, 1.0), (1L, 5L, 85L, 1.0),   // delta u1 — merges (10m gap)
      (2L, 6L, 0L, 2.0), (2L, 7L, 30L, 2.0),    // base u2 boundary session
      (2L, 8L, 120L, 2.0),                      // delta u2 — 90m gap, no merge
      (3L, 9L, 90L, 3.0), (3L, 10L, 95L, 3.0),  // delta-only u3
      (4L, 11L, 10L, 4.0))                      // base-only u4
    val ev = rows.map { case (u, e, m, v) => (e, t(m), u, "x", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val cutoffMin = 75L // between u1's boundary session and its delta tail
    val base = ev.filter($"ts" < t(cutoffMin))
    val delta = ev.filter($"ts" >= t(cutoffMin))
    val incremental = Analytics
      .incrementalMerge(Analytics.sessionize(base), Analytics.sessionize(delta))
    val full = Analytics.sessionize(ev)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"user_id", $"session_seq", $"n_events", $"min_tus", $"max_tus",
        $"value_cents")
      .collect().toSet
    assert(key(incremental) === key(full))
    // and the merge branch actually fired: u1 has 2 sessions, not 3
    val u1 = incremental.filter($"user_id" === 1L).count()
    assert(u1 === 2L)
  }

  test("q134 token budget: allocations sum to the budget exactly, floors respected") {
    val rows = run("q134_token_budget")
      .select($"floor_alloc", $"alloc").as[(Long, Long)].collect()
    assert(rows.map(_._2).sum === 1000000L) // Σ alloc == B, the Hamilton invariant
    assert(rows.forall { case (f, a) => a == f || a == f + 1 })
  }

  test("q135 bins: equal population ±1 and non-overlapping value ranges") {
    val bins = run("q135_equidepth_bins")
      .select($"bin", $"n_rows", $"lo_cents", $"hi_cents")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(bins.length === 16)
    val sizes = bins.map(_._2)
    assert(sizes.max - sizes.min <= 1) // equi-depth
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bin ${a._1} hi ${a._4} > bin ${b._1} lo ${b._3}")
    }
  }

  test("q125 textrank: 20 distinct keywords, ranks above the damping floor, rerun-stable") {
    val a = run("q125_textrank").collect().toSeq
    assert(a.size === 20)
    assert(a.map(_.getString(0)).distinct.size === 20)
    // every node's rank = 150000 + 0.85·(weighted in-mass) ≥ the floor;
    // top-20 of a connected co-occurrence graph sits well above it
    assert(a.forall(_.getLong(1) >= 150000L))
    // integer fixed-point must be run-to-run identical (hash-gate safety)
    val b = run("q125_textrank").collect().toSeq
    assert(a === b)
  }
}
