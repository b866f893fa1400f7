package graft.operators

import graft.{QueryDef, QueryModule}
import graft.functions.Portable
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal join/segmentation operators the reference's pipelines imply but
  * never name: the as-of join (every financial "latest quote at event time"
  * lookup — the stream-static join at spark_consumer.py:121-146 is the
  * degenerate same-day case, cf. /root/reference/data_collection/
  * spark_consumer.py) and gap-based sessionization (the per-user activity
  * segmentation a 100 TB event log needs before any per-session stats).
  *
  * Scale shapes:
  *   - q62: the quote side is dim-sized (per-key daily grain), so the as-of
  *     becomes: interval-ize quotes with `lead` (window over the DIM only),
  *     explode each validity interval into its covered dates, broadcast,
  *     and equi-join the fact on (key, date) — the fact table never
  *     shuffles and never sorts. Staleness is capped (13 days) so interval
  *     explosion is bounded; DuckDB's native ASOF JOIN with the same cap
  *     is the oracle, checking the rewrite against a first-class
  *     implementation of the operator.
  *   - q63: one shuffle on user_id (high cardinality — parallelism grows
  *     with data), then lag/prefix-sum/segment-aggregate all evaluate
  *     sort-locally inside each partition. Timestamps compare as integer
  *     epoch-microseconds on both engines.
  */
object Temporal extends QueryModule {

  private def cents(c: org.apache.spark.sql.Column) =
    sum((c.cast(DecimalType(28, 2)) * 100).cast("long"))

  /** The quote-table domain every as-of query (q62/q94/q101/q158) samples:
    * per-(event_type, day) exact close cents, read from the daily_events
    * SILVER rollup instead of a per-query fact aggregate (SharedSubtreeSpec
    * promotion). (y·100)::long == Σ per-row cents exactly — each
    * decimal(28,2)·100 term is integral and decimal accumulation is exact.
    */
  private def quoteDomain(
      spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    CoreBatch.dailyEvents(spark, dir)
      .select($"event_type", $"day".as("d"),
        ($"y" * 100).cast("long").as("close_cents"))
  }

  // ---------------------------------------------------------------------
  // q62 — as-of join: each event matched to the latest "trading day" quote
  // at or before its date (≤ 13 days stale). Quote days are a
  // deterministically-hashed 70% subset of (type, day) aggregates, so real
  // multi-day gaps exist at every SF. Result grain: (event_type,
  // staleness_days) — every cell checks the join's date arithmetic.
  // ---------------------------------------------------------------------
  private val q62 = QueryDef(
    "q62_asof_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"ts".isNotNull)
        .select($"event_id", $"event_type", to_date($"ts").as("d"), $"value")
      val quotes = quoteDomain(spark, dir)
        .withColumnRenamed("d", "qdate")
        .filter(pmod(Portable.md5Hash64(
          concat($"event_type", lit("|"), $"qdate".cast("string"))), lit(10)) < 7)
      val wq = Window.partitionBy($"event_type").orderBy($"qdate")
      val intervals = quotes
        .withColumn("end_d",
          least(coalesce(date_sub(lead($"qdate", 1).over(wq), 1),
            date_add($"qdate", 13)), date_add($"qdate", 13)))
        .select($"event_type", $"qdate", $"close_cents",
          explode(sequence($"qdate", $"end_d")).as("d"))
      ev.join(broadcast(intervals), Seq("event_type", "d"))
        .withColumn("staleness", datediff($"d", $"qdate"))
        .groupBy($"event_type", $"staleness")
        .agg(count(lit(1)).as("n_events"), cents($"value").as("value_cents"))
        .orderBy($"event_type", $"staleness")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, event_type, CAST(ts AS DATE) AS d, value
        FROM events WHERE ts IS NOT NULL),
      quotes AS (
        SELECT event_type, d AS qdate,
               sum(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS close_cents
        FROM ev GROUP BY 1, 2
        HAVING ${Portable.md5Hash64Sql("event_type || '|' || CAST(qdate AS VARCHAR)")} % 10 < 7)
      SELECT e.event_type, e.d - q.qdate AS staleness,
             count(*) AS n_events,
             CAST(sum(CAST(CAST(e.value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents
      FROM ev e ASOF JOIN quotes q
        ON e.event_type = q.event_type AND e.d >= q.qdate
      WHERE e.d - q.qdate <= 13
      GROUP BY 1, 2 ORDER BY e.event_type, staleness"""))

  // ---------------------------------------------------------------------
  // q63 — gap sessionization: per-user sessions split at >30-minute idle
  // gaps (lag → break flag → prefix-sum session id → segment aggregate),
  // summarized per user so every session boundary affects the output.
  // ---------------------------------------------------------------------
  private val GapUs = 30L * 60 * 1000000
  private val q63 = QueryDef(
    "q63_sessionize",
    (spark, dir) => {
      import spark.implicits._
      // session ids come pre-stitched off the chunk-scanned user_scan
      // silver (Analytics.chunkedUserScan) — no raw per-user window
      val sessions = Analytics.userScan(spark, dir)
        .groupBy($"user_id", $"sid")
        .agg(count(lit(1)).as("n_events"),
          (max($"tus") - min($"tus")).as("dur_us"))
      sessions
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum($"n_events").as("n_events"),
          max($"n_events").as("max_session_events"),
          max($"dur_us").as("max_session_us"))
        .orderBy($"user_id")
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id
        FROM events WHERE ts IS NOT NULL),
      flagged AS (
        SELECT user_id, tus, event_id,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > $GapUs THEN 1 ELSE 0 END AS brk
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      sid AS (
        SELECT user_id, tus,
               sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      sessions AS (
        SELECT user_id, sid, count(*) AS n_events,
               max(tus) - min(tus) AS dur_us
        FROM sid GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             max(n_events) AS max_session_events,
             max(dur_us) AS max_session_us
      FROM sessions GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------------
  // q94 — NATIVE as-of join (plans.AsOfJoinExec — the custom
  // LogicalPlan/Strategy/SparkPlan operator): same quote-table domain as
  // q62 but with UNBOUNDED lookback, which the interval-explode rewrite
  // cannot express in bounded work. One co-partitioning exchange per
  // side, sort within partitions, single merge-scan — the operator q62's
  // Scaladoc promises as the exact form. DuckDB's native ASOF JOIN (no
  // staleness cap this time) is the oracle: two independent first-class
  // implementations of the operator must agree cell-for-cell.
  // ---------------------------------------------------------------------
  private val q94 = QueryDef(
    "q94_asof_native",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"ts".isNotNull)
        .select($"event_id", $"event_type", to_date($"ts").as("d"), $"value")
      val quotes = quoteDomain(spark, dir)
        .filter(pmod(Portable.md5Hash64(
          concat($"event_type", lit("|"), $"d".cast("string"))), lit(10)) < 7)
        .select($"event_type".as("q_type"), $"d".as("qdate"), $"close_cents")
      graft.plans.AsOf.join(ev, quotes,
          Seq("event_type" -> "q_type"), "d", "qdate")
        .filter($"qdate".isNotNull) // ASOF is inner; drop pre-first-quote rows
        .withColumn("staleness", datediff($"d", $"qdate"))
        .groupBy($"event_type", $"staleness")
        .agg(count(lit(1)).as("n_events"), cents($"value").as("value_cents"))
        .orderBy($"event_type", $"staleness")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, event_type, CAST(ts AS DATE) AS d, value
        FROM events WHERE ts IS NOT NULL),
      quotes AS (
        SELECT event_type, d AS qdate,
               sum(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS close_cents
        FROM ev GROUP BY 1, 2
        HAVING ${Portable.md5Hash64Sql("event_type || '|' || CAST(qdate AS VARCHAR)")} % 10 < 7)
      SELECT e.event_type, e.d - q.qdate AS staleness,
             count(*) AS n_events,
             CAST(sum(CAST(CAST(e.value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents
      FROM ev e ASOF JOIN quotes q
        ON e.event_type = q.event_type AND e.d >= q.qdate
      GROUP BY 1, 2 ORDER BY e.event_type, staleness"""))

  // ---------------------------------------------------------------------
  // q101 — native as-of join, LEFT-OUTER surface: the exec has emitted
  // null-extended rows for match-less left rows since day one (q94 filters
  // them away to meet DuckDB's inner ASOF); here they are kept and
  // aggregated as the NULL-staleness cell per event type. The quote table
  // deliberately starts a week into the event range, so a pre-first-quote
  // population exists at every SF and the outer path is genuinely
  // exercised. Oracle: DuckDB ASOF LEFT JOIN — two independent first-class
  // implementations of the outer form must agree cell-for-cell, including
  // the NULL cells.
  // ---------------------------------------------------------------------
  private val QuoteStart = "2024-01-08"
  private val q101 = QueryDef(
    "q101_asof_left",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"ts".isNotNull)
        .select($"event_id", $"event_type", to_date($"ts").as("d"), $"value")
      val quotes = quoteDomain(spark, dir)
        .filter(pmod(Portable.md5Hash64(
          concat($"event_type", lit("|"), $"d".cast("string"))), lit(10)) < 7 &&
          $"d" >= lit(QuoteStart).cast("date"))
        .select($"event_type".as("q_type"), $"d".as("qdate"), $"close_cents")
      graft.plans.AsOf.join(ev, quotes,
          Seq("event_type" -> "q_type"), "d", "qdate")
        .withColumn("staleness", datediff($"d", $"qdate")) // NULL ⇔ no quote yet
        .groupBy($"event_type", $"staleness")
        .agg(
          count(lit(1)).as("n_events"),
          count($"qdate").as("n_matched"),
          cents($"value").as("value_cents"))
        .orderBy($"event_type", $"staleness".asc_nulls_first)
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, event_type, CAST(ts AS DATE) AS d, value
        FROM events WHERE ts IS NOT NULL),
      quotes AS (
        SELECT event_type, d AS qdate,
               sum(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS close_cents
        FROM ev GROUP BY 1, 2
        HAVING ${Portable.md5Hash64Sql("event_type || '|' || CAST(qdate AS VARCHAR)")} % 10 < 7
           AND qdate >= DATE '$QuoteStart')
      SELECT e.event_type, e.d - q.qdate AS staleness,
             count(*) AS n_events,
             count(q.qdate) AS n_matched,
             CAST(sum(CAST(CAST(e.value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents
      FROM ev e ASOF LEFT JOIN quotes q
        ON e.event_type = q.event_type AND e.d >= q.qdate
      GROUP BY 1, 2 ORDER BY e.event_type, staleness NULLS FIRST"""))

  // ---------------------------------------------------------------------
  // q158 — as-of join with TOLERANCE (pandas merge_asof(tolerance=...)):
  // the native as-of match is kept only while the quote is ≤ 3 days
  // stale; older matches are demoted to unmatched — the staleness cap a
  // production feature-store join needs so a dead symbol doesn't serve
  // week-old features forever. Expressed as the SAME native as-of plan
  // (one co-partitioned merge-scan) plus a post-join conditional null-out
  // — tolerance never changes WHICH row is latest, only whether it
  // qualifies, so no second join and no plan change. Oracle: DuckDB ASOF
  // LEFT JOIN with the identical CASE demotion.
  // ---------------------------------------------------------------------
  private val TolDays = 3
  private val q158 = QueryDef(
    "q158_asof_tolerance",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"ts".isNotNull)
        .select($"event_id", $"event_type", to_date($"ts").as("d"), $"value")
      val quotes = quoteDomain(spark, dir)
        .filter(pmod(Portable.md5Hash64(
          concat($"event_type", lit("|"), $"d".cast("string"))), lit(10)) < 7 &&
          $"d" >= lit(QuoteStart).cast("date"))
        .select($"event_type".as("q_type"), $"d".as("qdate"), $"close_cents")
      graft.plans.AsOf.join(ev, quotes,
          Seq("event_type" -> "q_type"), "d", "qdate")
        .withColumn("raw_staleness", datediff($"d", $"qdate"))
        .withColumn("staleness",
          when($"raw_staleness" <= TolDays, $"raw_staleness")) // else NULL
        .groupBy($"event_type", $"staleness")
        .agg(
          count(lit(1)).as("n_events"),
          count($"staleness").as("n_in_tolerance"),
          cents($"value").as("value_cents"))
        .orderBy($"event_type", $"staleness".asc_nulls_first)
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, event_type, CAST(ts AS DATE) AS d, value
        FROM events WHERE ts IS NOT NULL),
      quotes AS (
        SELECT event_type, d AS qdate,
               sum(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS close_cents
        FROM ev GROUP BY 1, 2
        HAVING ${Portable.md5Hash64Sql("event_type || '|' || CAST(qdate AS VARCHAR)")} % 10 < 7
           AND qdate >= DATE '$QuoteStart'),
      j AS (
        SELECT e.event_type, e.value,
               CASE WHEN e.d - q.qdate <= $TolDays THEN e.d - q.qdate END AS staleness
        FROM ev e ASOF LEFT JOIN quotes q
          ON e.event_type = q.event_type AND e.d >= q.qdate)
      SELECT event_type, staleness, count(*) AS n_events,
             count(staleness) AS n_in_tolerance,
             CAST(sum(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents
      FROM j GROUP BY 1, 2 ORDER BY event_type, staleness NULLS FIRST"""))

  // ---------------------------------------------------------------------
  // q181 — POINT-IN-TIME dimension snapshots (the SCD2 companion q139
  // stores history FOR): "what was every user's state at each month
  // end?" — the snapshot-table generation every warehouse runs off its
  // dimension history, and the canonical PIT-correctness case for a
  // feature store (training joins must see the version valid AT the
  // label time, never the current one). The probe grid is |users| ×
  // |month-ends| (dimension-grain, never event-grain); the lookup runs
  // through the NATIVE as-of operator (plans/AsOfJoin — merge-scan, one
  // buffered right row) on (user, snapshot ≥ valid_from), exercising it
  // on a composed input rather than the raw fixture. DuckDB's built-in
  // ASOF LEFT JOIN replays the identical semantics as the oracle.
  // Output: per (snapshot, state) user census + the never-matched count
  // (users whose history starts after the snapshot — the PIT-correct
  // NULL a current-state join would silently fill).
  // ---------------------------------------------------------------------
  private val q181 = QueryDef(
    "q181_pit_snapshots",
    (spark, dir) => {
      import spark.implicits._
      val hist = Series.scd2History(spark, dir)
        .select($"user_id".as("h_user"), $"event_type".as("state"),
          $"valid_from")
      val ev = Tables.events(spark, dir)
        .filter($"ts".isNotNull && $"user_id".isNotNull)
      val bounds = ev.agg(
        to_date(date_trunc("month", min($"ts"))).as("lo"),
        to_date(max($"ts")).as("hi"))
      val snaps = broadcast(bounds)
        .select(explode(expr(
          "sequence(lo, hi, interval 1 month)")).as("m"))
        .select(last_day($"m").cast("timestamp").as("snap_ts"))
      val grid = ev.select($"user_id").distinct().crossJoin(broadcast(snaps))
      val pit = graft.plans.AsOf.join(
        grid, hist,
        keys = Seq("user_id" -> "h_user"),
        leftTimeCol = "snap_ts", rightTimeCol = "valid_from")
      pit.groupBy(to_date($"snap_ts").as("snapshot"),
          coalesce($"state", lit("<no-history-yet>")).as("state"))
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"snapshot", $"state")
    },
    Some(s"""
      WITH ${Series.scd2Sql},
      ev AS (
        SELECT user_id, ts FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      bounds AS (
        SELECT CAST(date_trunc('month', min(ts)) AS DATE) AS lo,
               CAST(max(ts) AS DATE) AS hi
        FROM ev),
      snaps AS (
        SELECT CAST(last_day(CAST(m AS DATE)) AS TIMESTAMP) AS snap_ts FROM (
          SELECT unnest(generate_series(CAST(lo AS TIMESTAMP),
            CAST(hi AS TIMESTAMP), INTERVAL 1 MONTH)) AS m
          FROM bounds)),
      grid AS (
        SELECT u.user_id, s.snap_ts
        FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN snaps s),
      pit AS (
        SELECT g.user_id, g.snap_ts, h.event_type AS state
        FROM grid g ASOF LEFT JOIN scd_h2 h
          ON g.user_id = h.user_id AND h.valid_from <= g.snap_ts)
      SELECT CAST(snap_ts AS DATE) AS snapshot,
             COALESCE(state, '<no-history-yet>') AS state,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM pit GROUP BY 1, 2 ORDER BY snapshot, state"""))

  override val defs: Seq[QueryDef] = Seq(q62, q63, q94, q101, q158, q181)
}
