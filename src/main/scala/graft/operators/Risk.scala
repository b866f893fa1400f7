package graft.operators

import graft.{QueryDef, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Risk / market-structure analytics the reference's daily-return layer
  * (data_processing/stock_pipeline.py:159-188 volatility + portfolio
  * notebooks) grows into once the series feed risk reports: range-based
  * volatility estimators next to the close-to-close baseline, market
  * concentration (Herfindahl) per month, and Brinson–Fachler attribution
  * of the momentum portfolio's active return into allocation / selection
  * / interaction by region.
  *
  * Scale notes (100 TB stance):
  *   - q321's OHLC day bars are ONE map-combinable rollup of lineitem
  *     (the daily_bars discipline with min_by/max_by open/close); the
  *     per-day estimator terms are scalar expressions and the monthly
  *     readout is a second rollup — nothing holds more than
  *     (ticker, day) grain, the only window is the declared `ticker`
  *     daily-bars lag.
  *   - q322 is two map-combinable rollups: (mon, ticker) dollar volume,
  *     then mon. The squared-volume sum needs > 64 bits; it rides
  *     DECIMAL(38,0) on Spark and HUGEINT in DuckDB — both exact — and
  *     only its double RATIO ever leaves the rollup.
  *   - q323's ntile window partitions by `mon` (≤ |tickers| rows per
  *     cell — dimension grain, declared in WindowBounds); the region
  *     dim attach is a broadcast; the month-total re-join attaches a
  *     unique mon-keyed aggregate (fan-out 1).
  *
  * Determinism: all estimator terms are floor-quantized to integer nano
  * BEFORE any aggregation (the q306 no-float-agg rule); means of
  * possibly-negative sums go through sign-peeled division
  * ([[CrossSection.speelDivSql]]); double constants cross engines as the
  * shortest-roundtrip literal via CAST('…' AS DOUBLE) (the q305 trap);
  * ntile carries the full (mom_r, ticker) tie-break.
  */
object Risk extends QueryModule {

  // ---------------------------------------------------------------------
  // q321 — RANGE-BASED VOLATILITY ESTIMATORS (Parkinson 1980;
  // Garman–Klass 1980; Rogers–Satchell 1991): per (ticker, month), the
  // per-day variance estimate under each estimator, averaged over the
  // month's trading days, next to the close-to-close baseline — the
  // estimator-efficiency readout every risk desk runs (Parkinson uses
  // the day's high/low range, GK adds open/close, RS stays unbiased
  // under drift). All four are reported as integer NANO per-day
  // variance (per-day terms floor-quantized to 1e-9 before the integer
  // mean), plus the realized efficiency ratio cc/pk in milli.
  //   pk = (ln(H/L))² / (4 ln 2)
  //   gk = 0.5 (ln(H/L))² − (2 ln 2 − 1)(ln(C/O))²     (can be negative)
  //   rs = ln(H/C)·ln(H/O) + ln(L/C)·ln(L/O)           (≥ 0 always)
  //   cc = (ln(C/C_prev))²
  // Scale: one lineitem rollup to (ticker, day) OHLC, one declared
  // `ticker` lag window at daily-bars grain, one (ticker, mon) rollup.
  // ---------------------------------------------------------------------
  /** 1/(4 ln 2) and (2 ln 2 − 1), precomputed once in Scala so both
    * engines parse the same shortest-roundtrip double literal.
    */
  private val InvFourLn2: Double = 1.0 / (4.0 * math.log(2.0))
  private val GkB: Double = 2.0 * math.log(2.0) - 1.0

  private val q321 = QueryDef(
    "q321_range_vol",
    (spark, dir) => {
      import spark.implicits._
      val ohlc = Tables.lineitem(spark, dir)
        .withColumn("cents",
          ($"l_extendedprice".cast(DecimalType(28, 2)) * 100).cast("long"))
        .withColumn("seq",
          ($"l_orderkey" * 16 + $"l_linenumber") * 100000000L + $"cents")
        .groupBy($"l_suppkey".as("ticker"), to_date($"l_shipdate").as("date"))
        .agg(min_by($"cents", $"seq").as("open_c"),
          max_by($"cents", $"seq").as("close_c"),
          max($"cents").as("high_c"), min($"cents").as("low_c"))
      val wT = Window.partitionBy("ticker").orderBy("date")
      val terms = ohlc
        .withColumn("prev_c", lag($"close_c", 1).over(wT))
        .withColumn("lhl",
          log($"high_c".cast("double") / $"low_c".cast("double")))
        .withColumn("lco",
          log($"close_c".cast("double") / $"open_c".cast("double")))
        .withColumn("lhc",
          log($"high_c".cast("double") / $"close_c".cast("double")))
        .withColumn("lho",
          log($"high_c".cast("double") / $"open_c".cast("double")))
        .withColumn("llc",
          log($"low_c".cast("double") / $"close_c".cast("double")))
        .withColumn("llo",
          log($"low_c".cast("double") / $"open_c".cast("double")))
        .withColumn("pk_n",
          floor(lit(1.0e9) * (($"lhl" * $"lhl") * lit(InvFourLn2)))
            .cast("long"))
        .withColumn("gk_n",
          floor(lit(1.0e9) * ((lit(0.5) * ($"lhl" * $"lhl")) -
            (lit(GkB) * ($"lco" * $"lco")))).cast("long"))
        .withColumn("rs_n",
          floor(lit(1.0e9) * (($"lhc" * $"lho") + ($"llc" * $"llo")))
            .cast("long"))
        .withColumn("cc_n",
          when($"prev_c".isNotNull, {
            val lr = log($"close_c".cast("double") / $"prev_c".cast("double"))
            floor(lit(1.0e9) * (lr * lr)).cast("long")
          }))
      terms
        .groupBy($"ticker",
          date_trunc("month", $"date").cast("date").as("mon"))
        .agg(count(lit(1)).as("n_days"),
          sum($"pk_n").as("spk"), sum($"gk_n").as("sgk"),
          sum($"rs_n").as("srs"),
          count($"cc_n").as("n_cc"), sum($"cc_n").as("scc"))
        .filter($"n_days" >= 5)
        .withColumn("pk_var_nano", expr("spk div n_days"))
        .withColumn("gk_var_nano",
          expr(CrossSection.speelDivSql("sgk", "n_days", "div")))
        .withColumn("rs_var_nano", expr("srs div n_days"))
        .withColumn("cc_var_nano",
          when($"n_cc" > 0L, expr("scc div n_cc")))
        .withColumn("cc_over_pk_milli",
          when($"n_cc" > 0L && $"spk" > 0L,
            floor(lit(1000.0) *
              (($"scc".cast("double") / $"n_cc".cast("double")) /
                ($"spk".cast("double") / $"n_days".cast("double"))))
              .cast("long")))
        .select($"ticker", $"mon", $"n_days", $"n_cc",
          $"cc_var_nano", $"pk_var_nano", $"gk_var_nano", $"rs_var_nano",
          $"cc_over_pk_milli")
        .orderBy($"ticker", $"mon")
    },
    Some(s"""
      WITH ohlc AS (
        SELECT l_suppkey AS ticker, CAST(l_shipdate AS DATE) AS date,
               arg_min(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT),
                       (l_orderkey * 16 + l_linenumber) * 100000000
                         + CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT))
                 AS open_c,
               arg_max(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT),
                       (l_orderkey * 16 + l_linenumber) * 100000000
                         + CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT))
                 AS close_c,
               max(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT))
                 AS high_c,
               min(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT))
                 AS low_c
        FROM lineitem GROUP BY 1, 2),
      lg AS (
        SELECT *, lag(close_c, 1) OVER (PARTITION BY ticker ORDER BY date)
                 AS prev_c,
               ln(CAST(high_c AS DOUBLE) / CAST(low_c AS DOUBLE)) AS lhl,
               ln(CAST(close_c AS DOUBLE) / CAST(open_c AS DOUBLE)) AS lco,
               ln(CAST(high_c AS DOUBLE) / CAST(close_c AS DOUBLE)) AS lhc,
               ln(CAST(high_c AS DOUBLE) / CAST(open_c AS DOUBLE)) AS lho,
               ln(CAST(low_c AS DOUBLE) / CAST(close_c AS DOUBLE)) AS llc,
               ln(CAST(low_c AS DOUBLE) / CAST(open_c AS DOUBLE)) AS llo
        FROM ohlc),
      t AS (
        SELECT ticker, date,
               CAST(floor(1.0e9 * ((lhl * lhl) * CAST('$InvFourLn2' AS DOUBLE)))
                 AS BIGINT) AS pk_n,
               CAST(floor(1.0e9 * ((0.5 * (lhl * lhl)) -
                 (CAST('$GkB' AS DOUBLE) * (lco * lco)))) AS BIGINT) AS gk_n,
               CAST(floor(1.0e9 * ((lhc * lho) + (llc * llo))) AS BIGINT)
                 AS rs_n,
               CASE WHEN prev_c IS NOT NULL THEN
                 CAST(floor(1.0e9 *
                   (ln(CAST(close_c AS DOUBLE) / CAST(prev_c AS DOUBLE)) *
                    ln(CAST(close_c AS DOUBLE) / CAST(prev_c AS DOUBLE))))
                   AS BIGINT)
               END AS cc_n
        FROM lg),
      m AS (
        SELECT ticker, date_trunc('month', date) AS mon,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(pk_n) AS BIGINT) AS spk,
               CAST(sum(gk_n) AS BIGINT) AS sgk,
               CAST(sum(rs_n) AS BIGINT) AS srs,
               CAST(count(cc_n) AS BIGINT) AS n_cc,
               CAST(sum(cc_n) AS BIGINT) AS scc
        FROM t GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT ticker, mon, n_days, n_cc,
             CASE WHEN n_cc > 0 THEN scc // n_cc END AS cc_var_nano,
             spk // n_days AS pk_var_nano,
             ${CrossSection.speelDivSql("sgk", "n_days", "//")} AS gk_var_nano,
             srs // n_days AS rs_var_nano,
             CASE WHEN n_cc > 0 AND spk > 0 THEN
               CAST(floor(1000.0 *
                 ((CAST(scc AS DOUBLE) / CAST(n_cc AS DOUBLE)) /
                  (CAST(spk AS DOUBLE) / CAST(n_days AS DOUBLE)))) AS BIGINT)
             END AS cc_over_pk_milli
      FROM m ORDER BY ticker, mon"""))

  // ---------------------------------------------------------------------
  // q322 — MARKET CONCENTRATION (Herfindahl–Hirschman): per month, the
  // HHI of dollar-volume shares across the ticker universe, the
  // effective number of names 1/HHI, and the largest single-name share —
  // the liquidity-concentration census a market-risk desk reads next to
  // the q261 illiquidity screen. Volumes are exact cent BIGINTs; Σv²
  // exceeds 64 bits so it rides DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
  // — both exact integers, so the double ratios are identical
  // cross-engine.
  // Scale: two map-combinable rollups — (mon, ticker) then mon. The
  // squared-sum state is one 128-bit cell per group.
  // ---------------------------------------------------------------------
  private val q322 = QueryDef(
    "q322_hhi_concentration",
    (spark, dir) => {
      import spark.implicits._
      val v = Tables.lineitem(spark, dir)
        .withColumn("cents",
          ($"l_extendedprice".cast(DecimalType(28, 2)) * 100).cast("long"))
        .groupBy(date_trunc("month", to_date($"l_shipdate")).cast("date")
            .as("mon"), $"l_suppkey".as("ticker"))
        .agg(sum($"cents".cast(DecimalType(28, 0))).cast("long").as("v"))
      v.groupBy($"mon")
        .agg(count(lit(1)).as("n_names"),
          sum($"v").as("sum_v"),
          sum($"v".cast(DecimalType(19, 0)) * $"v".cast(DecimalType(19, 0)))
            .as("sum_v2"),
          max($"v").as("max_v"))
        .withColumn("hhi_ppm",
          floor(lit(1.0e6) * ($"sum_v2".cast("double") /
            ($"sum_v".cast("double") * $"sum_v".cast("double"))))
            .cast("long"))
        .withColumn("eff_names_micro",
          floor(lit(1.0e6) * (($"sum_v".cast("double") *
            $"sum_v".cast("double")) / $"sum_v2".cast("double")))
            .cast("long"))
        .withColumn("top1_share_ppm",
          floor(lit(1.0e6) * ($"max_v".cast("double") /
            $"sum_v".cast("double"))).cast("long"))
        .select($"mon", $"n_names", $"sum_v", $"max_v",
          $"hhi_ppm", $"eff_names_micro", $"top1_share_ppm")
        .orderBy($"mon")
    },
    Some("""
      WITH v AS (
        SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS mon,
               l_suppkey AS ticker,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                 AS BIGINT)) AS BIGINT) AS v
        FROM lineitem GROUP BY 1, 2),
      m AS (
        SELECT mon, CAST(count(*) AS BIGINT) AS n_names,
               CAST(sum(v) AS BIGINT) AS sum_v,
               sum(CAST(v AS HUGEINT) * v) AS sum_v2,
               CAST(max(v) AS BIGINT) AS max_v
        FROM v GROUP BY 1)
      SELECT mon, n_names, sum_v, max_v,
             CAST(floor(1.0e6 * (CAST(sum_v2 AS DOUBLE) /
               (CAST(sum_v AS DOUBLE) * CAST(sum_v AS DOUBLE)))) AS BIGINT)
               AS hhi_ppm,
             CAST(floor(1.0e6 * ((CAST(sum_v AS DOUBLE) *
               CAST(sum_v AS DOUBLE)) / CAST(sum_v2 AS DOUBLE))) AS BIGINT)
               AS eff_names_micro,
             CAST(floor(1.0e6 * (CAST(max_v AS DOUBLE) /
               CAST(sum_v AS DOUBLE))) AS BIGINT) AS top1_share_ppm
      FROM m ORDER BY mon"""))

  // ---------------------------------------------------------------------
  // q323 — BRINSON–FACHLER ATTRIBUTION: per (month, region), decompose
  // the momentum portfolio's active return over the equal-weight
  // benchmark into allocation (being over/underweight a region whose
  // benchmark return beat the total), selection (picking better names
  // within the region), and interaction — THE monthly attribution report
  // every PM reads. Portfolio = equal-weight top momentum quintile
  // (q247's ntile legs); benchmark = equal-weight universe. Returns are
  // integer milli (the q306 quantized-return discipline), weights exact
  // count rationals; each effect is ONE fixed-order double expression
  // over BIGINTs, floor-quantized to micro (1e-6 absolute return).
  //   alloc  = (wp_g − wb_g)·(rb_g − rb)
  //   select = wb_g·(rp_g − rb_g)          (rp_g := rb_g when no holding)
  //   inter  = (wp_g − wb_g)·(rp_g − rb_g)
  // By construction Σ_g (alloc+select+inter) = rp − rb exactly (before
  // quantization) — the spec's driver recompute asserts the identity.
  // Scale: the ntile window partitions by `mon` (dimension grain,
  // declared); region dim attach is a broadcast; (mon, reg) and mon
  // rollups; the month-total join attaches a unique mon-keyed aggregate.
  // ---------------------------------------------------------------------
  /** The shared effect expressions — ONE fixed-order double expression
    * each over the rollup BIGINTs, identical text on both engines (Spark
    * parses them through expr()). Declared BEFORE q323: its oracle string
    * interpolates them at object-init time.
    */
  private val WpgSql =
    "(CAST(n_p AS DOUBLE) / CAST(np_tot AS DOUBLE))"
  private val WbgSql =
    "(CAST(n_b AS DOUBLE) / CAST(n_tot AS DOUBLE))"
  private val RbgSql =
    "(CAST(sum_rb AS DOUBLE) / (1000.0 * CAST(n_b AS DOUBLE)))"
  private val RbSql =
    "(CAST(sum_all AS DOUBLE) / (1000.0 * CAST(n_tot AS DOUBLE)))"
  private val RpgSql =
    "(CASE WHEN n_p = 0 THEN " + RbgSql +
      " ELSE (CAST(sum_rp AS DOUBLE) / (1000.0 * CAST(n_p AS DOUBLE))) END)"
  private val AllocSql =
    s"CAST(floor(1.0e6 * (($WpgSql - $WbgSql) * ($RbgSql - $RbSql))) AS BIGINT)"
  private val SelectSql =
    s"CAST(floor(1.0e6 * ($WbgSql * ($RpgSql - $RbgSql))) AS BIGINT)"
  private val InterSql =
    s"CAST(floor(1.0e6 * (($WpgSql - $WbgSql) * ($RpgSql - $RbgSql))) AS BIGINT)"

  private val q323 = QueryDef(
    "q323_brinson_attribution",
    (spark, dir) => {
      import spark.implicits._
      val sup = Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey".as("ticker"), $"n_regionkey".as("reg"))
      val wQ = Window.partitionBy("mon").orderBy($"mom_r", $"ticker")
      val base = CrossSection.withSignal(CrossSection.mbars(spark, dir))
        .withColumn("bucket", ntile(5).over(wQ))
        .withColumn("r_milli",
          floor(lit(1000.0) * ($"next_c" - $"close_c").cast("double") /
            $"close_c".cast("double")).cast("long"))
        .join(broadcast(sup), "ticker")
      val regional = base.groupBy($"mon", $"reg")
        .agg(count(lit(1)).as("n_b"), sum($"r_milli").as("sum_rb"),
          sum(when($"bucket" === 5, 1L).otherwise(0L)).as("n_p"),
          sum(when($"bucket" === 5, $"r_milli").otherwise(0L)).as("sum_rp"))
      val totals = regional.groupBy($"mon")
        .agg(sum($"n_b").as("n_tot"), sum($"sum_rb").as("sum_all"),
          sum($"n_p").as("np_tot"))
        .filter($"n_tot" >= 10L)
      regional.join(totals, "mon")
        .withColumn("wb_ppm",
          floor(lit(1.0e6) * ($"n_b".cast("double") / $"n_tot".cast("double")))
            .cast("long"))
        .withColumn("wp_ppm",
          floor(lit(1.0e6) * ($"n_p".cast("double") / $"np_tot".cast("double")))
            .cast("long"))
        .withColumn("alloc_micro", expr(AllocSql))
        .withColumn("select_micro", expr(SelectSql))
        .withColumn("inter_micro", expr(InterSql))
        .select($"mon", $"reg", $"n_b", $"n_p", $"wb_ppm", $"wp_ppm",
          $"alloc_micro", $"select_micro", $"inter_micro")
        .orderBy($"mon", $"reg")
    },
    Some(s"""
      WITH ${CrossSection.mbarsSql}, ${CrossSection.signalSql},
      base AS (
        SELECT s.ticker, s.mon,
               CAST(floor(1000.0 * CAST(next_c - close_c AS DOUBLE)
                 / CAST(close_c AS DOUBLE)) AS BIGINT) AS r_milli,
               ntile(5) OVER (PARTITION BY s.mon ORDER BY mom_r, s.ticker)
                 AS bucket,
               n.n_regionkey AS reg
        FROM sigr s
        JOIN supplier sp ON sp.s_suppkey = s.ticker
        JOIN nation n ON n.n_nationkey = sp.s_nationkey),
      regional AS (
        SELECT mon, reg, CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(r_milli) AS BIGINT) AS sum_rb,
               CAST(sum(CASE WHEN bucket = 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_p,
               CAST(sum(CASE WHEN bucket = 5 THEN r_milli ELSE 0 END)
                 AS BIGINT) AS sum_rp
        FROM base GROUP BY 1, 2),
      totals AS (
        SELECT mon, CAST(sum(n_b) AS BIGINT) AS n_tot,
               CAST(sum(sum_rb) AS BIGINT) AS sum_all,
               CAST(sum(n_p) AS BIGINT) AS np_tot
        FROM regional GROUP BY 1 HAVING sum(n_b) >= 10)
      SELECT r.mon, reg, n_b, n_p,
             CAST(floor(1.0e6 * (CAST(n_b AS DOUBLE) / CAST(n_tot AS DOUBLE)))
               AS BIGINT) AS wb_ppm,
             CAST(floor(1.0e6 * (CAST(n_p AS DOUBLE) / CAST(np_tot AS DOUBLE)))
               AS BIGINT) AS wp_ppm,
             $AllocSql AS alloc_micro,
             $SelectSql AS select_micro,
             $InterSql AS inter_micro
      FROM regional r JOIN totals t ON t.mon = r.mon
      ORDER BY r.mon, reg"""))

  override val defs: Seq[QueryDef] = Seq(q321, q322, q323)
}
