package graft.operators

import graft.{QueryDef, QueryModule}
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

  override val defs: Seq[QueryDef] = Seq(q80, q81, q82, q83)
}
