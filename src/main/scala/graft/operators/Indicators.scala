package graft.operators

import graft.{QueryDef, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Technical-indicator window operators over the daily bars table — the
  * indicator family a stock pipeline grows into right after the
  * reference's shift/rolling-mean features (reference
  * ml_models/02_train_baseline_model.ipynb · cell 3 builds prev_close +
  * 3-day rolling means; these are the standard next steps on the same
  * grouped-window shape): RSI, Bollinger bands, EWMA, z-score outliers.
  *
  * Scale notes: every query is ONE shuffle on ticker, then sorted window
  * evaluation within partitions — same shape as WindowFeatures. The
  * z-score pass uses an unbounded window for the per-ticker moments and
  * reuses that partitioning for its final aggregate (no second exchange).
  *
  * Determinism (the interesting part — each indicator is engineered so
  * Spark and DuckDB produce BIT-IDENTICAL doubles):
  *   - all accumulation happens in integer cents (exact on both engines);
  *   - the float tail of each formula is a fixed sequence of single IEEE
  *     ops (cast, one divide, one sqrt, scale-by-2) which are correctly
  *     rounded and therefore engine-independent;
  *   - EWMA uses dyadic weights (α = 1/2, 10 taps): every term and every
  *     partial sum is exactly representable, so even association order
  *     cannot matter (34 significant bits ≪ 53).
  * Plain `avg`/`stddev`/`ewm` float accumulation would diverge between
  * engines at the ulp level and fail the hash gate.
  */
object Indicators extends QueryModule {

  private def wTicker = Window.partitionBy("ticker").orderBy("date")

  /** Bars with an exact integer-cents close column. */
  private def barsCents(spark: SparkSession, dir: String) = {
    import spark.implicits._
    WindowFeatures.bars(spark, dir)
      .withColumn("cents", ($"close".cast(DecimalType(28, 2)) * 100).cast("long"))
  }

  private val centsSql =
    "CAST(CAST(close AS DECIMAL(28,2)) * 100 AS BIGINT)"

  // ---------------------------------------------------------------------
  // q80 — RSI(14), Cutler's variant (SMA of gains/losses — the published
  // simple-average form; Wilder's EMA smoothing needs α = 1/14, which is
  // not dyadic and therefore not bit-portable). Gains/losses are integer
  // cents, the 14-day sums are exact, and the final ratio is one double
  // division. A flat 14-day window (sum_gain + sum_loss = 0) pins RSI to
  // the conventional neutral 50.
  // ---------------------------------------------------------------------
  private val q80 = QueryDef(
    "q80_rsi",
    (spark, dir) => {
      import spark.implicits._
      val w14 = wTicker.rowsBetween(-13, 0)
      val diff = $"cents" - lag($"cents", 1).over(wTicker)
      barsCents(spark, dir)
        .withColumn("diff", diff)
        .withColumn("gain",
          when($"diff".isNull, lit(null))
            .when($"diff" > 0, $"diff").otherwise(lit(0L)))
        .withColumn("loss",
          when($"diff".isNull, lit(null))
            .when($"diff" < 0, -$"diff").otherwise(lit(0L)))
        .withColumn("gain_cents", sum($"gain").over(w14))
        .withColumn("loss_cents", sum($"loss").over(w14))
        .withColumn("n_periods", count($"gain").over(w14))
        .filter($"n_periods" === 14)
        .withColumn("rsi",
          when($"gain_cents" + $"loss_cents" === 0, lit(50.0))
            .otherwise(lit(100.0) * $"gain_cents".cast("double") /
              ($"gain_cents" + $"loss_cents").cast("double")))
        .select($"ticker", $"date", $"gain_cents", $"loss_cents", $"rsi")
        .orderBy($"ticker", $"date")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents FROM bars),
      d AS (SELECT ticker, date,
              cents - lag(cents) OVER (PARTITION BY ticker ORDER BY date) AS diff
            FROM c),
      g AS (SELECT ticker, date,
              CASE WHEN diff IS NULL THEN NULL
                   WHEN diff > 0 THEN diff ELSE 0 END AS gain,
              CASE WHEN diff IS NULL THEN NULL
                   WHEN diff < 0 THEN -diff ELSE 0 END AS loss
            FROM d),
      s AS (SELECT ticker, date,
              CAST(sum(gain) OVER w14 AS BIGINT) AS gain_cents,
              CAST(sum(loss) OVER w14 AS BIGINT) AS loss_cents,
              count(gain) OVER w14 AS n_periods
            FROM g
            WINDOW w14 AS (PARTITION BY ticker ORDER BY date
                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      SELECT ticker, date, gain_cents, loss_cents,
             CASE WHEN gain_cents + loss_cents = 0 THEN 50.0
                  ELSE 100.0 * CAST(gain_cents AS DOUBLE)
                       / CAST(gain_cents + loss_cents AS DOUBLE) END AS rsi
      FROM s WHERE n_periods = 14 ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q81 — Bollinger bands (20-day mean ± 2σ, population σ). The variance
  // numerator n·Σx² − (Σx)² is computed in exact 64-bit cents arithmetic
  // (≤ 4·10^16 at any realistic price), then ONE cast, ONE divide, ONE
  // sqrt, and the band arms are mean ± 2·σ — each a single correctly
  // rounded IEEE op, so both engines land on the same bits.
  // ---------------------------------------------------------------------
  private val q81 = QueryDef(
    "q81_bollinger",
    (spark, dir) => {
      import spark.implicits._
      val w20 = wTicker.rowsBetween(-19, 0)
      barsCents(spark, dir)
        .withColumn("s", sum($"cents").over(w20))
        .withColumn("q", sum($"cents" * $"cents").over(w20))
        .withColumn("n", count($"cents").over(w20))
        .filter($"n" === 20)
        .withColumn("mean_cents", $"s".cast("double") / lit(20.0))
        .withColumn("sd_cents",
          sqrt((lit(20L) * $"q" - $"s" * $"s").cast("double") / lit(400.0)))
        .withColumn("upper", $"mean_cents" + lit(2.0) * $"sd_cents")
        .withColumn("lower", $"mean_cents" - lit(2.0) * $"sd_cents")
        .select($"ticker", $"date", $"cents".as("close_cents"),
          $"mean_cents", $"sd_cents", $"upper", $"lower")
        .orderBy($"ticker", $"date")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents FROM bars),
      s AS (SELECT ticker, date, cents,
              CAST(sum(cents) OVER w20 AS BIGINT) AS s,
              CAST(sum(cents * cents) OVER w20 AS BIGINT) AS q,
              count(cents) OVER w20 AS n
            FROM c
            WINDOW w20 AS (PARTITION BY ticker ORDER BY date
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      b AS (SELECT ticker, date, cents,
              CAST(s AS DOUBLE) / 20.0 AS mean_cents,
              sqrt(CAST(20 * q - s * s AS DOUBLE) / 400.0) AS sd_cents
            FROM s WHERE n = 20)
      SELECT ticker, date, cents AS close_cents, mean_cents, sd_cents,
             mean_cents + 2.0 * sd_cents AS upper,
             mean_cents - 2.0 * sd_cents AS lower
      FROM b ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q82 — EWMA close (α = 1/2 over a 10-tap window, pandas `ewm(alpha=.5)
  // .mean()` adjusted form truncated to 10 terms — beyond 10 taps the
  // weight is < 2^-9 of the head and pandas' own result is visually
  // identical). α = 1/2 is the bit-portable choice: weights 2^-k are
  // dyadic, every product cents·2^-k is exact (≤ 36 significant bits) and
  // every partial sum stays exact, so the only rounding in the whole
  // formula is the final division by the exact constant Σw = 1023/512.
  // ---------------------------------------------------------------------
  private val q82 = QueryDef(
    "q82_ewma",
    (spark, dir) => {
      import spark.implicits._
      val w10 = wTicker.rowsBetween(-9, 0)
      val num = (0 until 10)
        .map(k => lag($"cents", k).over(wTicker).cast("double") * lit(math.pow(0.5, k)))
        .reduce(_ + _)
      barsCents(spark, dir)
        .withColumn("n", count($"cents").over(w10))
        .withColumn("ewma_cents", num / lit(1.998046875))
        .filter($"n" === 10)
        .select($"ticker", $"date", $"cents".as("close_cents"), $"ewma_cents")
        .orderBy($"ticker", $"date")
    },
    Some {
      val terms = (0 until 10)
        .map(k => s"CAST(lag(cents, $k) OVER wt AS DOUBLE) * ${0.5d.pow(k)}")
        .mkString(" + ")
      s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents FROM bars),
      e AS (SELECT ticker, date, cents,
              ($terms) / 1.998046875 AS ewma_cents,
              count(cents) OVER (PARTITION BY ticker ORDER BY date
                                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS n
            FROM c
            WINDOW wt AS (PARTITION BY ticker ORDER BY date))
      SELECT ticker, date, cents AS close_cents, ewma_cents
      FROM e WHERE n = 10 ORDER BY ticker, date"""
    })

  private implicit class DoublePow(private val d: Double) {
    // exact dyadic literal for the oracle text (0.5^k prints with every
    // significant digit — both engines parse it back to the same double)
    def pow(k: Int): String = {
      val v = math.pow(d, k)
      new java.math.BigDecimal(v).toPlainString
    }
  }

  // ---------------------------------------------------------------------
  // q83 — z-score anomaly days (|x − μ| > 3σ per ticker over full
  // history). The predicate is evaluated ENTIRELY in exact integer
  // arithmetic — (n·x − S)² > 9·(n·Q − S²) is z² > 9 cleared of both
  // denominators — widened so no float ever enters the comparison: the
  // outlier set is bit-deterministic by construction. Spark widens through
  // DECIMAL (38-digit cap; actual magnitudes ≤ 10^26 fit exactly), the
  // oracle through HUGEINT (DuckDB's native int128 — its int64-backed
  // DECIMAL class overflows on the S² product).
  // ---------------------------------------------------------------------
  private val q83 = QueryDef(
    "q83_outlier_days",
    (spark, dir) => {
      import spark.implicits._
      val wAll = Window.partitionBy("ticker")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val dev = ($"n" * $"cents" - $"s").cast(DecimalType(19, 0))
      val varNum = $"n".cast(DecimalType(8, 0)) * $"q".cast(DecimalType(20, 0)) -
        $"s".cast(DecimalType(19, 0)) * $"s".cast(DecimalType(19, 0))
      barsCents(spark, dir)
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum($"cents").over(wAll))
        .withColumn("q", sum($"cents" * $"cents").over(wAll))
        .withColumn("is_outlier", dev * dev > lit(9) * varNum)
        .groupBy($"ticker")
        .agg(
          count(lit(1)).as("n_days"),
          sum(when($"is_outlier", 1L).otherwise(0L)).as("n_outliers"),
          min(when($"is_outlier", $"date")).as("first_outlier"),
          max(when($"is_outlier", $"date")).as("last_outlier"))
        .orderBy($"ticker")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents FROM bars),
      m AS (SELECT ticker, date, cents,
              count(*) OVER wt AS n,
              CAST(sum(cents) OVER wt AS BIGINT) AS s,
              CAST(sum(cents * cents) OVER wt AS BIGINT) AS q
            FROM c
            WINDOW wt AS (PARTITION BY ticker)),
      f AS (SELECT ticker, date,
              CAST(n * cents - s AS HUGEINT) * CAST(n * cents - s AS HUGEINT)
                > 9 * (CAST(n AS HUGEINT) * CAST(q AS HUGEINT)
                       - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS is_outlier
            FROM m)
      SELECT ticker, count(*) AS n_days,
             CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             min(CASE WHEN is_outlier THEN date END) AS first_outlier,
             max(CASE WHEN is_outlier THEN date END) AS last_outlier
      FROM f GROUP BY ticker ORDER BY ticker"""))

  // ---------------------------------------------------------------------
  // q153 — VWAP (volume-weighted average price) per ticker-day, plus each
  // day's deviation of the close from its own VWAP in basis points. TPC-H
  // lineitem plays the trade tape: l_extendedprice is the notional
  // (price×size), l_quantity the size, so VWAP = Σnotional / Σsize per
  // (ticker, day) — exact cent/centi-unit integer sums, ONE double
  // division at the end, one rollup on the fact table.
  // ---------------------------------------------------------------------
  private val q153 = QueryDef(
    "q153_vwap",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_suppkey".as("ticker"), to_date($"l_shipdate").as("date"))
        .agg(
          sum(($"l_extendedprice".cast(DecimalType(28, 2)) * 100).cast("long"))
            .as("notional_cents"),
          sum(($"l_quantity".cast(DecimalType(28, 2)) * 100).cast("long"))
            .as("size_centi"),
          count(lit(1)).as("n_trades"))
        .withColumn("vwap",
          $"notional_cents".cast("double") / $"size_centi".cast("double"))
        .orderBy($"ticker", $"date")
    },
    Some("""
      SELECT l_suppkey AS ticker, CAST(l_shipdate AS DATE) AS date,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT) AS notional_cents,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT) AS size_centi,
             count(*) AS n_trades,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT)) AS DOUBLE)
               / CAST(sum(CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100 AS BIGINT)) AS DOUBLE) AS vwap
      FROM lineitem GROUP BY 1, 2 ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q154 — MACD, SMA variant (q80's Cutler stance: the published EMA form
  // needs α = 2/13, 2/27 — not dyadic, not bit-portable; the SMA
  // crossover variant keeps EVERY intermediate an exact integer over a
  // common denominator): macd·312 = 26·Σ₁₂ − 12·Σ₂₆ cents, signal·2808 =
  // Σ₉ macd·312, histogram from the same integers; three doubles emitted
  // by fixed single divisions at the very end. Both window passes and
  // the lag reuse ONE ticker partitioning.
  // ---------------------------------------------------------------------
  private val q154 = QueryDef(
    "q154_macd",
    (spark, dir) => {
      import spark.implicits._
      val w12 = wTicker.rowsBetween(-11, 0)
      val w26 = wTicker.rowsBetween(-25, 0)
      val w9 = wTicker.rowsBetween(-8, 0)
      barsCents(spark, dir)
        .withColumn("n", count($"cents").over(w26))
        .withColumn("macd312",
          lit(26L) * sum($"cents").over(w12) - lit(12L) * sum($"cents").over(w26))
        .filter($"n" === 26)
        .withColumn("n9", count($"macd312").over(w9))
        .withColumn("signal2808", sum($"macd312").over(w9))
        .filter($"n9" === 9)
        .select($"ticker", $"date",
          ($"macd312".cast("double") / 312.0).as("macd_cents"),
          ($"signal2808".cast("double") / 2808.0).as("signal_cents"),
          (($"macd312" * 9L - $"signal2808").cast("double") / 2808.0)
            .as("histogram_cents"))
        .orderBy($"ticker", $"date")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents FROM bars),
      m AS (
        SELECT ticker, date,
               26 * sum(cents) OVER (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
             - 12 * sum(cents) OVER (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS macd312,
               count(cents) OVER (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS n
        FROM c),
      s AS (
        SELECT ticker, date, macd312,
               CAST(sum(macd312) OVER wt9 AS BIGINT) AS signal2808,
               count(macd312) OVER wt9 AS n9
        FROM m WHERE n = 26
        WINDOW wt9 AS (PARTITION BY ticker ORDER BY date
                       ROWS BETWEEN 8 PRECEDING AND CURRENT ROW))
      SELECT ticker, date,
             CAST(macd312 AS DOUBLE) / 312.0 AS macd_cents,
             CAST(signal2808 AS DOUBLE) / 2808.0 AS signal_cents,
             CAST(macd312 * 9 - signal2808 AS DOUBLE) / 2808.0 AS histogram_cents
      FROM s WHERE n9 = 9 ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q155 — maximum drawdown per ticker: running peak of the close, per-row
  // drawdown in integer basis points ((peak − close)·10⁴ div peak), then
  // each ticker's worst drawdown with the FIRST date it was reached
  // (min_by over the (drawdown desc, date asc) total order via max_by on
  // a composite key). Single ticker partitioning shared by the running
  // max and the final rollup; all integer until the emitted double.
  // ---------------------------------------------------------------------
  private val q155 = QueryDef(
    "q155_max_drawdown",
    (spark, dir) => {
      import spark.implicits._
      val wRun = wTicker.rowsBetween(Window.unboundedPreceding, 0)
      barsCents(spark, dir)
        .withColumn("peak", max($"cents").over(wRun))
        .withColumn("dd_bp", expr("(peak - cents) * 10000 div peak"))
        .groupBy($"ticker")
        .agg(
          max($"dd_bp").as("max_dd_bp"),
          min_by($"date", struct((-$"dd_bp").as("a"), $"date".as("b")))
            .as("trough_date"),
          max($"peak").as("peak_cents"),
          count(lit(1)).as("n_days"))
        .withColumn("max_dd_frac", $"max_dd_bp".cast("double") / 10000.0)
        .orderBy($"ticker")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents FROM bars),
      r AS (
        SELECT ticker, date, cents,
               max(cents) OVER (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM c),
      d AS (
        SELECT ticker, date, peak, (peak - cents) * 10000 // peak AS dd_bp
        FROM r),
      best AS (
        SELECT ticker, date AS trough_date,
               row_number() OVER (PARTITION BY ticker
                 ORDER BY dd_bp DESC, date) AS rn
        FROM d),
      agg AS (
        SELECT ticker, CAST(max(dd_bp) AS BIGINT) AS max_dd_bp,
               max(peak) AS peak_cents, count(*) AS n_days
        FROM d GROUP BY ticker)
      SELECT a.ticker, a.max_dd_bp, b.trough_date, a.peak_cents, a.n_days,
             CAST(a.max_dd_bp AS DOUBLE) / 10000.0 AS max_dd_frac
      FROM agg a JOIN best b ON a.ticker = b.ticker AND b.rn = 1
      ORDER BY a.ticker"""))

  // ---------------------------------------------------------------------
  // q176 — ROLLING CORRELATION vs the market (20-day Pearson of a
  // ticker's daily milli-return against the equal-weight market mean
  // return): the beta/hedging input one step past q81's single-series
  // bands. Bit-portability engineering:
  //   - milli-returns and the market mean use SIGN-PEELED integer
  //     division (q148's rule — Spark `div` truncates, DuckDB `//`
  //     floors, and return diffs go negative);
  //   - all six rolling accumulators (n, Σx, Σy, Σx², Σy², Σxy) are
  //     exact integers over the 20-row frame;
  //   - the float tail is fixed-order: two sqrts of exactly-represented
  //     integers (IEEE sqrt is correctly rounded — unlike ln/exp it IS
  //     portable), one multiply, one divide. Flat windows emit NULL.
  // Scale: the market mean is a date-keyed rollup broadcast back onto
  // the bar stream; the rolling pass shares the single ticker exchange
  // with every other indicator. One new shuffle class: the |dates|-row
  // market table.
  // ---------------------------------------------------------------------
  private val q176 = QueryDef(
    "q176_rolling_corr",
    (spark, dir) => {
      import spark.implicits._
      val withPrev = barsCents(spark, dir)
        .withColumn("prev", lag($"cents", 1).over(wTicker))
        .filter($"prev".isNotNull && $"prev" > 0)
        .withColumn("x", expr(
          """CASE WHEN cents >= prev THEN ((cents - prev) * 1000) div prev
             ELSE -(((prev - cents) * 1000) div prev) END"""))
      val market = withPrev.groupBy($"date")
        .agg(sum($"x").as("sx"), count(lit(1)).as("nx"))
        .select($"date", expr(
          """CASE WHEN sx >= 0 THEN sx div nx
             ELSE -((-sx) div nx) END""").as("y"))
      val w20 = wTicker.rowsBetween(-19, 0)
      withPrev.join(broadcast(market), Seq("date"))
        .withColumn("n", count(lit(1)).over(w20))
        .withColumn("sx", sum($"x").over(w20))
        .withColumn("sy", sum($"y").over(w20))
        .withColumn("sxx", sum($"x" * $"x").over(w20))
        .withColumn("syy", sum($"y" * $"y").over(w20))
        .withColumn("sxy", sum($"x" * $"y").over(w20))
        .filter($"n" === 20)
        .withColumn("vx", $"n" * $"sxx" - $"sx" * $"sx")
        .withColumn("vy", $"n" * $"syy" - $"sy" * $"sy")
        .withColumn("corr20",
          when($"vx" > 0 && $"vy" > 0,
            ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              (sqrt($"vx".cast("double")) * sqrt($"vy".cast("double")))))
        .select($"ticker", $"date", $"x".as("ret_milli"),
          $"y".as("mkt_milli"), $"corr20")
        .orderBy($"ticker", $"date")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (
        SELECT ticker, date, $centsSql AS cents,
               lag($centsSql, 1) OVER (PARTITION BY ticker ORDER BY date) AS prev
        FROM bars),
      rets AS (
        SELECT ticker, date,
               CASE WHEN cents >= prev THEN ((cents - prev) * 1000) // prev
                    ELSE -(((prev - cents) * 1000) // prev) END AS x
        FROM c WHERE prev IS NOT NULL AND prev > 0),
      market AS (
        SELECT date,
               CASE WHEN sum(x) >= 0 THEN CAST(sum(x) AS BIGINT) // count(*)
                    ELSE -(CAST(-sum(x) AS BIGINT) // count(*)) END AS y
        FROM rets GROUP BY 1),
      j AS (
        SELECT r.ticker, r.date, r.x, m.y
        FROM rets r JOIN market m ON m.date = r.date),
      acc AS (
        SELECT ticker, date, x, y,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(x) OVER w AS BIGINT) AS sx,
               CAST(sum(y) OVER w AS BIGINT) AS sy,
               CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
               CAST(sum(y * y) OVER w AS BIGINT) AS syy,
               CAST(sum(x * y) OVER w AS BIGINT) AS sxy
        FROM j
        WINDOW w AS (PARTITION BY ticker ORDER BY date
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      SELECT ticker, date, x AS ret_milli, y AS mkt_milli,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
               THEN CAST(n * sxy - sx * sy AS DOUBLE) /
                    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                     sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             END AS corr20
      FROM acc WHERE n = 20
      ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q279 — ON-BALANCE VOLUME (Granville 1963): the volume-flow indicator
  // next to the price family — obv_t = obv_{t−1} + sign(Δclose_t)·vol_t,
  // the running tally of volume on up-days minus down-days (divergence
  // between OBV and price is the classic accumulation signal). PURE
  // INTEGER: sign from exact cents diffs, one cumulative window SUM of
  // signed volumes per ticker — no division, no floats, nothing to
  // quantize. One shuffle on ticker, one daily-bars-grain window pass
  // (declared bound).
  // ---------------------------------------------------------------------
  private val q279 = QueryDef(
    "q279_obv",
    (spark, dir) => {
      import spark.implicits._
      val wCum = wTicker.rowsBetween(Window.unboundedPreceding, 0)
      barsCents(spark, dir)
        .withColumn("d", $"cents" - lag($"cents", 1).over(wTicker))
        .withColumn("sv",
          when($"d".isNull || $"d" === 0L, 0L)
            .when($"d" > 0L, $"volume")
            .otherwise(-$"volume"))
        .withColumn("obv", sum($"sv").over(wCum))
        .select($"ticker", $"date", $"cents".as("close_cents"),
          $"volume", $"sv", $"obv")
        .orderBy($"ticker", $"date")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents, volume FROM bars),
      d AS (
        SELECT ticker, date, cents, volume,
               cents - lag(cents) OVER (PARTITION BY ticker ORDER BY date)
                 AS d
        FROM c),
      s AS (
        SELECT ticker, date, cents, volume,
               CAST(CASE WHEN d IS NULL OR d = 0 THEN 0
                         WHEN d > 0 THEN volume ELSE -volume END AS BIGINT)
                 AS sv
        FROM d)
      SELECT ticker, date, cents AS close_cents, volume, sv,
             CAST(sum(sv) OVER (PARTITION BY ticker ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS obv
      FROM s ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q293 — KAUFMAN EFFICIENCY RATIO (Kaufman 1995, "Smarter Trading"):
  // ER = |net 10-day change| / Σ|daily changes| ∈ [0, 1] — the
  // trend-vs-chop gauge that drives KAMA's adaptive smoothing constant
  // (directional move at 1, pure noise at 0). FULLY integer: net and
  // path are exact cent sums over the 10-bar frame, er_milli is one
  // non-negative truncating division, and a flat window (path = 0 ⇒
  // net = 0) yields NULL — the conventional undefined case, decided by
  // an integer predicate on both engines.
  // Scale: one ticker-window pass at the daily-bars grain (declared
  // bound, silver-scan evidence), two frame sums — the q80 shape.
  // ---------------------------------------------------------------------
  private val q293 = QueryDef(
    "q293_kaufman_er",
    (spark, dir) => {
      import spark.implicits._
      val w10 = wTicker.rowsBetween(-9, 0)
      barsCents(spark, dir)
        .withColumn("d", $"cents" - lag($"cents", 1).over(wTicker))
        .withColumn("net10", $"cents" - lag($"cents", 10).over(wTicker))
        .withColumn("path10", sum(abs($"d")).over(w10))
        .filter($"net10".isNotNull)
        .withColumn("er_milli",
          when($"path10" > 0L,
            expr("(1000 * abs(net10)) div path10")))
        .select($"ticker", $"date", $"net10", $"path10", $"er_milli")
        .orderBy($"ticker", $"date")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      d AS (
        SELECT ticker, date, $centsSql AS cents,
               $centsSql - lag($centsSql, 1) OVER w AS d,
               $centsSql - lag($centsSql, 10) OVER w AS net10
        FROM bars
        WINDOW w AS (PARTITION BY ticker ORDER BY date)),
      p AS (
        SELECT ticker, date, net10,
               CAST(sum(abs(d)) OVER (PARTITION BY ticker ORDER BY date
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS path10
        FROM d)
      SELECT ticker, date, net10, path10,
             CASE WHEN path10 > 0
                  THEN (1000 * abs(net10)) // path10 END AS er_milli
      FROM p WHERE net10 IS NOT NULL
      ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q294 — VALUE-AT-RISK + EXPECTED SHORTFALL (historical simulation;
  // Artzner et al. 1999 coherence — ES is the subadditive tail measure
  // Basel moved to): per ticker over daily milli-returns, the 95% VaR
  // is the k-th worst return with k = ⌈n/20⌉ (an exact order
  // statistic), and ES is the mean of the k worst — sign-peeled integer
  // division, since tail returns are negative. Ranks carry the full
  // (ret, date) tie-break, k comes from each ticker's own n (broadcast
  // count join), and every comparison is integer — no quantile
  // interpolation anywhere (documented divergence from linear-interp
  // percentiles: historical-simulation VaR is the order statistic by
  // definition).
  // Scale: one ticker-window lag for returns, one rank window at the
  // daily-bars grain (declared bound), a broadcast per-ticker count,
  // one map-combinable tail rollup.
  // ---------------------------------------------------------------------
  private val q294 = QueryDef(
    "q294_expected_shortfall",
    (spark, dir) => {
      import spark.implicits._
      val rets = barsCents(spark, dir)
        .withColumn("prev_c", lag($"cents", 1).over(wTicker))
        .filter($"prev_c".isNotNull)
        .withColumn("ret_milli",
          floor(lit(1000.0) * ($"cents" - $"prev_c").cast("double") /
            $"prev_c".cast("double")).cast("long"))
      val counts = rets.groupBy($"ticker").agg(count(lit(1)).as("n"))
        .filter($"n" >= 40)
        .withColumn("k", expr("(n + 19) div 20"))
      val wRank = Window.partitionBy("ticker")
        .orderBy($"ret_milli".asc, $"date".asc)
      rets.join(broadcast(counts), "ticker")
        .withColumn("rn", row_number().over(wRank).cast("long"))
        .filter($"rn" <= $"k")
        .groupBy($"ticker", $"n", $"k")
        .agg(max($"ret_milli").as("var_milli"),
          sum($"ret_milli").as("tail_sum"))
        .withColumn("es_milli",
          expr(CrossSection.speelDivSql("tail_sum", "k", "div")))
        .select($"ticker", $"n", $"k", $"var_milli", $"es_milli")
        .orderBy($"ticker")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      rets AS (
        SELECT ticker, date,
               CAST(floor(CAST('1000.0' AS DOUBLE)
                 * CAST(cents - prev_c AS DOUBLE)
                 / CAST(prev_c AS DOUBLE)) AS BIGINT) AS ret_milli
        FROM (
          SELECT ticker, date, $centsSql AS cents,
                 lag($centsSql, 1) OVER (PARTITION BY ticker ORDER BY date)
                   AS prev_c
          FROM bars)
        WHERE prev_c IS NOT NULL),
      counts AS (
        SELECT ticker, CAST(count(*) AS BIGINT) AS n,
               (CAST(count(*) AS BIGINT) + 19) // 20 AS k
        FROM rets GROUP BY ticker HAVING count(*) >= 40),
      ranked AS (
        SELECT r.ticker, c.n, c.k, r.ret_milli,
               row_number() OVER (PARTITION BY r.ticker
                 ORDER BY r.ret_milli ASC, r.date ASC) AS rn
        FROM rets r JOIN counts c ON c.ticker = r.ticker)
      SELECT ticker, n, k,
             CAST(max(ret_milli) AS BIGINT) AS var_milli,
             ${CrossSection.speelDivSql("CAST(sum(ret_milli) AS BIGINT)", "k", "//")}
               AS es_milli
      FROM ranked WHERE rn <= k
      GROUP BY ticker, n, k
      ORDER BY ticker"""))

  // ---------------------------------------------------------------------
  // q299 — UNDERWATER-SPELL CENSUS (drawdown DURATION analysis): q155
  // reports how DEEP the worst drawdown went; recovery analysis asks
  // how LONG the account stayed below its peak — the Calmar/recovery
  // readout allocators actually screen on. A spell is a maximal run of
  // consecutive underwater bars (close < running peak), found with the
  // island trick: spell id = running count of at-peak bars (exact
  // integer, tie-safe because bar dates are unique per ticker). Per
  // ticker: spell count, the longest spell's duration/start (max-of-
  // struct with the (duration, start) lexicographic tie-break — start
  // is unique, so no residual tie), and the deepest single-bar gap in
  // exact cents.
  // Scale: two ticker-window passes at the daily-bars grain (declared
  // bound, silver-scan evidence) + one map-combinable two-level rollup.
  // ---------------------------------------------------------------------
  private val q299 = QueryDef(
    "q299_underwater_spells",
    (spark, dir) => {
      import spark.implicits._
      val uw = barsCents(spark, dir)
        .withColumn("peak", max($"cents").over(
          wTicker.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("at_peak", ($"cents" === $"peak").cast("long"))
        .withColumn("spell",
          sum($"at_peak").over(wTicker.rowsBetween(Window.unboundedPreceding, 0)))
        .filter($"cents" < $"peak")
      val spells = uw.groupBy($"ticker", $"spell")
        .agg(count(lit(1)).as("dur"),
          min($"date").as("start"),
          max($"peak" - $"cents").as("depth_c"))
      spells.groupBy($"ticker")
        .agg(count(lit(1)).as("n_spells"),
          max(struct($"dur", $"start")).getField("dur").as("max_dur"),
          max(struct($"dur", $"start")).getField("start")
            .as("longest_start"),
          max($"depth_c").as("max_depth_c"))
        .orderBy($"ticker")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      c AS (SELECT ticker, date, $centsSql AS cents FROM bars),
      p AS (
        SELECT ticker, date, cents,
               CAST(max(cents) OVER w AS BIGINT) AS peak
        FROM c
        WINDOW w AS (PARTITION BY ticker ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      s AS (
        SELECT ticker, date, cents, peak,
               CAST(sum(CASE WHEN cents = peak THEN 1 ELSE 0 END)
                 OVER (PARTITION BY ticker ORDER BY date
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS spell
        FROM p),
      sp AS (
        SELECT ticker, spell, CAST(count(*) AS BIGINT) AS dur,
               min(date) AS start,
               CAST(max(peak - cents) AS BIGINT) AS depth_c
        FROM s WHERE cents < peak GROUP BY 1, 2)
      SELECT ticker, CAST(count(*) AS BIGINT) AS n_spells,
             (max(struct_pack(d := dur, s := start))).d AS max_dur,
             (max(struct_pack(d := dur, s := start))).s AS longest_start,
             max(depth_c) AS max_depth_c
      FROM sp GROUP BY ticker ORDER BY ticker"""))

  override val defs: Seq[QueryDef] = Seq(q80, q81, q82, q83, q153, q154,
    q155, q176, q279, q293, q294, q299)
}
