package graft.operators

import graft.{SparkEntry, TestSpark}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the cross-sectional alpha-research family
  * (q246–q250): the Spearman IC is cross-checked against a naive
  * brute-force recompute, the quintile backtest's legs are recomputed by
  * hand for one month, the series diagnostics carry their structural
  * invariants (|r| ≤ 1, flag ≡ threshold), and the cointegration screen
  * honours blocking, top-k and estimator-sign contracts.
  */
class CrossSectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  test("q246 IC: matches a brute-force Spearman recompute per month") {
    // naive recompute: pull (mon, mom_r, fwd_r) rows to the driver
    // (fixture-sized), rank by sorting, apply the textbook formula
    val sig = CrossSection.mbars(spark, TestSpark.Sf001)
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy("ticker").orderBy("mon")
    val rows = sig
      .withColumn("mom_c", $"close_c" - lag($"close_c", 3).over(wT))
      .withColumn("next_c", lead($"close_c", 1).over(wT))
      .filter($"mom_c".isNotNull && $"next_c".isNotNull)
      .select($"mon".cast("string"), $"ticker",
        ($"mom_c".cast("double") / $"close_c".cast("double")).as("mom_r"),
        (($"next_c" - $"close_c").cast("double") / $"close_c".cast("double"))
          .as("fwd_r"))
      .as[(String, Long, Double, Double)].collect()
    val naive = rows.groupBy(_._1).collect {
      case (mon, rs) if rs.length >= 5 =>
        val rm = rs.sortBy(r => (r._3, r._2)).zipWithIndex
          .map { case (r, i) => r._2 -> (i + 1L) }.toMap
        val rf = rs.sortBy(r => (r._4, r._2)).zipWithIndex
          .map { case (r, i) => r._2 -> (i + 1L) }.toMap
        val n = rs.length.toLong
        val sumD2 = rs.map(r => { val d = rm(r._2) - rf(r._2); d * d }).sum
        val den = n * (n * n - 1)
        mon -> ((den - 6 * sumD2).toDouble / den.toDouble)
    }
    val got = run("q246_monthly_ic")
      .select($"mon".cast("string"), $"ic").as[(String, Double)]
      .collect().toMap
    assert(got.keySet === naive.keySet)
    naive.foreach { case (mon, ic) =>
      assert(got(mon) === ic, s"IC mismatch for $mon")
    }
  }

  test("q247 backtest: one month's legs recompute by hand; cum is the running sum") {
    val out = run("q247_momentum_ls").orderBy($"mon").collect()
    assert(out.length > 20)
    // cum must be the exact running integer sum (order-invariant by
    // construction — that is WHY the P&L accumulates integer milli-bp)
    var acc = 0L
    out.foreach { r =>
      acc += r.getAs[Long]("ls_milli_bp")
      assert(r.getAs[Long]("cum_ls_milli_bp") === acc)
      assert(r.getAs[Long]("n_names") >= 5)
      // legs are dollar-weighted returns of real portfolios: finite
      assert(!r.getAs[Double]("ret_top_bp").isNaN)
      assert(!r.getAs[Double]("ret_bot_bp").isNaN)
    }
  }

  test("q248 Ljung-Box: autocorrelations bounded, flag consistent, n = bars - 1") {
    val barsN = WindowFeatures.bars(spark, TestSpark.Sf001)
      .groupBy($"ticker").agg(count(lit(1)).as("nb"))
      .as[(Long, Long)].collect().toMap
    val out = run("q248_ljung_box").collect()
    assert(out.length === barsN.size)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === barsN(r.getAs[Long]("ticker")) - 1)
      (1 to 5).foreach { k =>
        val rm = r.getAs[Long](s"r${k}_milli")
        assert(rm >= -1000L && rm <= 1000L, s"r$k=$rm out of [-1,1]")
      }
      val q = r.getAs[Double]("q_lb")
      assert(q >= 0.0)
      assert(r.getAs[Boolean]("wn_rejected") === (q > 11.070497693516351))
    }
  }

  test("q249 variance ratio: positive, z-flag consistent, overlap counts line up") {
    val out = run("q249_variance_ratio").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val vr = r.getAs[Double]("vr")
      assert(vr > 0.0)
      // 5-bar diffs: exactly 4 fewer than 1-bar diffs per ticker
      assert(r.getAs[Long]("n_d5") === r.getAs[Long]("n_d1") - 4)
      val z = r.getAs[Double]("z")
      assert(r.getAs[Boolean]("rw_rejected") === (math.abs(z) > 1.96))
    }
  }

  test("q250 cointegration: top-k really is top-k, estimator signs agree, ranks bound") {
    val out = run("q250_cointegration").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val corr = r.getAs[Double]("corr")
      assert(math.abs(corr) <= 1.0)
      // hedge ratio and correlation must point the same way (β and ρ
      // share the sign of the covariance numerator)
      val beta = r.getAs[Long]("beta_milli")
      assert(corr * beta >= 0.0 || beta === -1L, // floor(-ε) = -1 at ρ≈0
        s"sign mismatch corr=$corr beta_milli=$beta")
      val acf = r.getAs[Double]("rank_acf1")
      assert(acf >= -1.0 && acf <= 1.0)
      assert(r.getAs[Boolean]("mean_reverting") === (acf < 0.6))
      assert(r.getAs[Long]("n_months") >= 24L)
    }
    // the screen picked the GLOBALLY strongest pairs: every selected
    // |corr| must be >= every non-selected pair's |corr| (recomputed
    // from the same moments via SQL on the monthly closes)
    if (out.length === 10) {
      val minSel = out.map(r => math.abs(r.getAs[Double]("corr"))).min
      val sup = graft.sources.Tables.supplier(spark, TestSpark.Sf001)
        .join(graft.sources.Tables.nation(spark, TestSpark.Sf001),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey".as("ticker"), $"n_regionkey".as("reg"))
      val m = CrossSection.mbars(spark, TestSpark.Sf001)
        .join(sup, "ticker").select($"reg", $"mon", $"ticker", $"close_c")
      val allCorr = m.as("a").join(m.as("b"),
          col("a.reg") === col("b.reg") && col("a.mon") === col("b.mon") &&
            col("a.ticker") < col("b.ticker"))
        .groupBy(col("a.ticker").as("ta"), col("b.ticker").as("tb"))
        .agg(count(lit(1)).as("n"),
          sum(col("a.close_c")).as("sx"), sum(col("b.close_c")).as("sy"),
          sum(col("a.close_c") * col("a.close_c")).as("sxx"),
          sum(col("b.close_c") * col("b.close_c")).as("syy"),
          sum(col("a.close_c") * col("b.close_c")).as("sxy"))
        .filter($"n" >= 24)
        .select(abs(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n" * $"syy" - $"sy" * $"sy").cast("double"))).as("ac"))
        .as[Double].collect().sorted(Ordering[Double].reverse)
      assert(allCorr.take(10).min <= minSel + 1e-12,
        "a stronger pair was left out of the top-10 screen")
    }
  }

  test("q252 CAPM: matches a brute-force driver recompute; R² bounded; flags consistent") {
    // naive recompute of the whole market-model regression from the
    // monthly closes (fixture-sized collect)
    val mb = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon".cast("string"), $"close_c")
      .as[(Long, String, Long)].collect()
    val rets = mb.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      rows.sortBy(_._2).sliding(2).collect {
        case Array(a, b) =>
          (t, b._2, math.floor(1000.0 * (b._3 - a._3).toDouble / a._3.toDouble).toLong)
      }
    }
    val mkt = rets.groupBy(_._2).collect {
      case (mon, rs) if rs.length >= 5 =>
        val s = rs.map(_._3).sum
        val n = rs.length
        mon -> (if (s >= 0) s / n else -((-s) / n))
    }
    val naive = rets.filter(r => mkt.contains(r._2)).groupBy(_._1).collect {
      case (t, rs) if rs.length >= 24 =>
        val xs = rs.map(r => mkt(r._2)); val ys = rs.map(_._3)
        val n = rs.length.toLong
        val sx = xs.sum; val sy = ys.sum
        val sxx = xs.map(x => x * x).sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        t -> (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    }
    val got = run("q252_capm_beta").collect()
    assert(got.length === naive.size)
    got.foreach { r =>
      val t = r.getAs[Long]("ticker")
      assert(r.getAs[Double]("beta") === naive(t), s"beta mismatch ticker $t")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
      assert(r.getAs[Boolean]("high_beta") === (r.getAs[Double]("beta") > 1.0))
    }
  }

  test("q254 turnover: matches a brute-force rank-pair recompute") {
    // naive: rank per month by (mom_r, ticker), pair consecutive months
    // per ticker, Pearson on the rank pairs + avg |Δrank| — all on the
    // driver from the monthly closes
    val mb = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon".cast("string"), $"close_c")
      .as[(Long, String, Long)].collect()
    val sig = mb.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val s = rows.sortBy(_._2)
      s.indices.drop(3).map { i =>
        (t, s(i)._2, (s(i)._3 - s(i - 3)._3).toDouble / s(i)._3.toDouble)
      }
    }
    val ranks = sig.groupBy(_._2).flatMap { case (mon, rs) =>
      rs.sortBy(r => (r._3, r._1)).zipWithIndex
        .map { case (r, i) => (r._1, mon) -> (i + 1L) }
    }
    def prevMon(m: String): String = {
      val Array(y, mo, d) = m.split("-").map(_.toInt)
      f"${if (mo == 1) y - 1 else y}%04d-${if (mo == 1) 12 else mo - 1}%02d-$d%02d"
    }
    val naive = ranks.keys.groupBy(_._2).map { case (mon, _) =>
      val pairs = ranks.collect {
        case ((t, m), rk) if m == mon && ranks.contains((t, prevMon(m))) =>
          (rk, ranks((t, prevMon(m))))
      }.toSeq
      mon -> pairs
    }.collect { case (mon, ps) if ps.length >= 5 =>
      val n = ps.length.toLong
      val su = ps.map(_._1).sum; val sv = ps.map(_._2).sum
      val suu = ps.map(p => p._1 * p._1).sum
      val svv = ps.map(p => p._2 * p._2).sum
      val suv = ps.map(p => p._1 * p._2).sum
      val sad = ps.map(p => math.abs(p._1 - p._2)).sum
      mon -> ((n * suv - su * sv).toDouble /
        math.sqrt((n * suu - su * su).toDouble * (n * svv - sv * sv).toDouble),
        1000L * sad / n)
    }
    val got = run("q254_signal_turnover")
      .select($"mon".cast("string"), $"rank_autocorr", $"churn_milli")
      .as[(String, Double, Long)].collect()
    assert(got.length === naive.size)
    got.foreach { case (mon, ac, churn) =>
      val (nAc, nChurn) = naive(mon)
      assert(ac === nAc, s"autocorr mismatch $mon")
      assert(churn === nChurn, s"churn mismatch $mon")
    }
  }

  test("q255 L-S alpha: single-row readout with consistent flag and finite stats") {
    val out = run("q255_ls_alpha").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_months") > 24)
    val t = r.getAs[Double]("t_alpha")
    assert(!t.isNaN && !t.isInfinite)
    assert(!r.getAs[Double]("beta").isNaN)
    assert(r.getAs[Boolean]("alpha_significant") === (math.abs(t) > 1.96))
  }

  test("q256 tear sheet: matches a driver recompute from the q247 leg returns") {
    val legs = run("q247_momentum_ls")
      .select($"mon".cast("string"), $"ret_top_bp", $"ret_bot_bp")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    val ys = legs.map(l => math.floor(l._2 - l._3).toLong)
    val n = ys.length.toLong
    val s = ys.sum
    var cum = 0L; var runmax = 0L; var maxdd = 0L
    ys.foreach { y =>
      cum += y; runmax = math.max(runmax, math.max(cum, 0L))
      maxdd = math.max(maxdd, runmax - cum)
    }
    val r = run("q256_strategy_stats").collect().head
    assert(r.getAs[Long]("n_months") === n)
    assert(r.getAs[Long]("mean_bp") ===
      (if (s >= 0) s / n else -((-s) / n)))
    assert(r.getAs[Long]("hit_milli") === 1000L * ys.count(_ > 0) / n)
    assert(r.getAs[Long]("max_drawdown_bp") === maxdd)
    val ss = ys.map(y => y * y).sum
    val sharpe = (s.toDouble / n) /
      math.sqrt((n * ss - s * s).toDouble / (n * (n - 1)).toDouble) *
      math.sqrt(12.0)
    assert(math.abs(r.getAs[Double]("sharpe_ann") - sharpe) < 1e-9)
  }

  test("q260 rolling beta: full windows only, drift is the 12-lag difference") {
    val out = run("q260_rolling_beta").collect()
    assert(out.nonEmpty)
    val byTicker = out.groupBy(_.getAs[Long]("ticker"))
    byTicker.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("mon").toString)
      // drift defined exactly where a 12-back beta exists
      sorted.zipWithIndex.foreach { case (r, i) =>
        val drift = r.get(r.fieldIndex("beta_drift"))
        if (i < 12) assert(drift == null, s"ticker $t row $i has early drift")
        else assert(math.abs(r.getAs[Double]("beta_drift") -
          (r.getAs[Double]("beta_12m") -
            sorted(i - 12).getAs[Double]("beta_12m"))) < 1e-12)
      }
    }
    // one spot ticker: the first emitted month is the 12th return month
    // (full-window gating really drops the warm-up rows)
    val mb = CrossSection.mbars(spark, TestSpark.Sf001)
      .groupBy($"ticker").agg(count(lit(1)).as("m"))
      .as[(Long, Long)].collect().toMap
    byTicker.foreach { case (t, rs) =>
      // months with returns = m - 1; full windows = that - 11 (all months
      // survive the >=5-name market filter on this fixture)
      assert(rs.length === mb(t) - 12, s"ticker $t window gating off")
    }
  }

  test("q262 Fama-MacBeth: per-month gamma recomputes from betas and returns") {
    // reconstruct both passes on the driver from the monthly closes
    val mb = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon".cast("string"), $"close_c")
      .as[(Long, String, Long)].collect()
    val rets = mb.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      rows.sortBy(_._2).sliding(2).collect { case Array(a, b) =>
        (t, b._2, math.floor(1000.0 * (b._3 - a._3).toDouble / a._3.toDouble).toLong)
      }
    }
    val mkt = rets.groupBy(_._2).collect { case (m, rs) if rs.length >= 5 =>
      val s = rs.map(_._3).sum; val n = rs.length
      m -> (if (s >= 0) s / n else -((-s) / n))
    }
    val betas = rets.filter(r => mkt.contains(r._2)).groupBy(_._1).collect {
      case (t, rs) if rs.length >= 24 =>
        val xs = rs.map(r => mkt(r._2)); val ys = rs.map(_._3)
        val n = rs.length.toLong
        val sx = xs.sum; val sy = ys.sum
        val sxx = xs.map(x => x * x).sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        t -> math.floor(1000.0 * (n * sxy - sx * sy).toDouble /
          (n * sxx - sx * sx).toDouble).toLong
    }
    val naive = rets.filter(r => betas.contains(r._1)).groupBy(_._2).collect {
      case (m, rs) if rs.length >= 5 =>
        val xs = rs.map(r => betas(r._1)); val ys = rs.map(_._3)
        val n = rs.length.toLong
        val bx = xs.sum; val by = ys.sum
        val bxx = xs.map(x => x * x).sum
        val bxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        m -> (n * bxy - bx * by).toDouble / (n * bxx - bx * bx).toDouble
    }
    val got = run("q262_fama_macbeth")
      .select($"mon".cast("string"), $"gamma").as[(String, Double)]
      .collect().toMap
    assert(got.keySet === naive.keySet)
    got.foreach { case (m, g) => assert(g === naive(m), s"gamma mismatch $m") }
  }

  test("q266 implied correlation: SSD identity holds and rho is sane") {
    val out = run("q266_implied_correlation").collect()
    assert(out.length > 20)
    out.foreach { r =>
      // estimator stays in a generous [-1.5, 1.5] band (quantized sigma
      // and equal-weight index mean make exact [-1/(n-1), 1] bounds soft)
      val rho = r.getAs[Double]("rho_implied")
      assert(rho > -1.5 && rho < 1.5, s"rho=$rho out of band")
      assert(r.getAs[Long]("ssd_idx") >= 0L)
      assert(r.getAs[Long]("sum_ssd") >= 0L)
      assert(r.getAs[Boolean]("high_corr_regime") === (rho > 0.5))
      assert(r.getAs[Long]("n") >= 5L)
    }
  }

  test("q269 downside beta: legs recompute brute-force, asymmetry is their gap") {
    val mb = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon".cast("string"), $"close_c")
      .as[(Long, String, Long)].collect()
    val rets = mb.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      rows.sortBy(_._2).sliding(2).collect { case Array(a, b) =>
        (t, b._2, math.floor(1000.0 * (b._3 - a._3).toDouble / a._3.toDouble).toLong)
      }
    }
    val mkt = rets.groupBy(_._2).collect { case (m, rs) if rs.length >= 5 =>
      val s = rs.map(_._3).sum; val n = rs.length
      m -> (if (s >= 0) s / n else -((-s) / n))
    }
    val xs = mkt.values.toSeq
    val sMu = xs.sum
    val mu = if (sMu >= 0) sMu / xs.length else -((-sMu) / xs.length)
    def slope(rows: Seq[(Long, Long)]): Double = {
      val n = rows.length.toLong
      val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
      val sxx = rows.map(r => r._1 * r._1).sum
      val sxy = rows.map(r => r._1 * r._2).sum
      (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    }
    val naive = rets.filter(r => mkt.contains(r._2)).groupBy(_._1).flatMap {
      case (t, rs) =>
        val dn = rs.collect { case (_, m, y) if mkt(m) < mu => (mkt(m), y) }
        val up = rs.collect { case (_, m, y) if mkt(m) > mu => (mkt(m), y) }
        if (dn.length >= 12 && up.length >= 12)
          Some(t -> (slope(dn), slope(up))) else None
    }
    val got = run("q269_downside_beta").collect()
    assert(got.length === naive.size)
    got.foreach { r =>
      val t = r.getAs[Long]("ticker")
      val (bd, bu) = naive(t)
      assert(r.getAs[Double]("beta_down") === bd, s"beta_down mismatch $t")
      assert(r.getAs[Double]("beta_up") === bu, s"beta_up mismatch $t")
      assert(r.getAs[Double]("asymmetry") === bd - bu)
      assert(r.getAs[Boolean]("crash_amplifier") === (bd > bu && bd > 1.0))
    }
  }

  test("q270 turn-of-month: bands partition all diff-days, stats recompute") {
    val out = run("q270_turn_of_month").collect()
      .map(r => r.getAs[String]("band") -> r).toMap
    assert(out.keySet === Set("first3", "last3", "mid"))
    // total banded days == total ticker-days minus one first-day per ticker
    val days = graft.sources.Tables.lineitem(spark, TestSpark.Sf001)
      .groupBy($"l_suppkey", to_date($"l_shipdate")).count()
    val nTickers = graft.sources.Tables.lineitem(spark, TestSpark.Sf001)
      .select($"l_suppkey").distinct().count()
    assert(out.values.map(_.getAs[Long]("n_days")).sum ===
      days.count() - nTickers)
    out.values.foreach { r =>
      val pm = r.getAs[Long]("pos_milli")
      assert(pm >= 0L && pm <= 1000L)
    }
  }

  test("q280 CSCV rank invariants: C(6,3) symmetric masks, ranks in range, PBO recomputes") {
    val rows = run("q280_pbo_cscv").collect()
    // exactly C(6,3) = 20 in-sample masks, in complementary pairs
    // (CSCV's defining symmetry: every split's IS set is some split's
    // OOS set, so the procedure cannot favor either half)
    assert(rows.length === 20)
    val masks = rows.map(_.getAs[Long]("c")).toSet
    assert(masks.forall(c => masks.contains(63L ^ c)),
      "mask set not closed under complement")
    val n = rows.map(_.getAs[Long]("n_strats")).distinct
    assert(n.length === 1 && n.head >= 5L)
    rows.foreach { r =>
      val rank = r.getAs[Long]("oos_rank")
      assert(rank >= 1L && rank <= n.head, s"rank $rank out of range")
      val om = r.getAs[Long]("omega_milli")
      assert(om === 1000L * rank / (n.head + 1))
    }
    // the headline recomputes from the per-mask ranks
    val below = rows.count(r => 2 * r.getAs[Long]("oos_rank") <= n.head)
    val pbo = rows.map(_.getAs[Long]("pbo_milli")).distinct
    assert(pbo === Seq(1000L * below / 20))
  }

  test("q250 plan: no cartesian product; stage-2 rides a broadcast of the top pairs") {
    val p = run("q250_cointegration").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "pair join degenerated to cartesian")
    assert(p.contains("BroadcastHashJoin"), "top-pair attach is not broadcast")
  }

  test("q282 granger: F is the nested-model statistic — nonnegative, flag consistent") {
    val rows = run("q282_granger_lead").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(n >= 30L)
      if (!r.isNullAt(3)) {
        val f = r.getDouble(3)
        // RSS_restricted ≥ RSS_unrestricted for nested OLS, always
        assert(f >= 0.0, s"negative F: $r")
        assert(r.getBoolean(4) === (f > 3.841458820694124), s"flag drifts: $r")
      } else assert(!r.getBoolean(4))
    }
  }

  test("q283 bipower: variation identities and the jump flag recompute") {
    val rows = run("q283_bipower_jump").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rv, bp, qp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (rjMilli, z, flag) = (r.getLong(5), r.getDouble(6), r.getBoolean(7))
      assert(rv > 0L && bp >= 0L && qp >= 0L && n >= 30L)
      // rj = 1 − BV/RV ≤ 1 by construction; winsorized |r| ≤ 2000 bounds
      // every term: r² ≤ 4·10⁶·n, |r||r'| likewise
      assert(rjMilli <= 1000L, s"rj above 1: $r")
      assert(rv <= 4000000L * n && bp <= 4000000L * n)
      // z and rj share a sign (the studentizer is positive)
      val bv = 1.5707963267948966 * bp.toDouble
      val rj = (rv.toDouble - bv) / rv.toDouble
      assert(math.signum(z) === math.signum(rj) || rj == 0.0)
      assert(flag === (z > 1.6448536269514722), s"flag drifts: $r")
    }
  }

  test("q289 calibration: decile table recomputes brute-force incl. ntile semantics") {
    val rows = run("q289_calibration").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // brute-force: per month sort by (mom_r, ticker), deal SQL-ntile
    // buckets (first n%10 buckets get ⌈n/10⌉), pool train/test counts
    val sig = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon", $"close_c")
      .as[(Long, java.sql.Date, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (tkr, xs) =>
        val s = xs.sortBy(_._2.toString)
        s.indices.flatMap { i =>
          if (i < 3 || i + 1 >= s.length) None
          else {
            val momC = s(i)._3 - s(i - 3)._3
            val momR = momC.toDouble / s(i)._3.toDouble
            Some((s(i)._2.toString.take(7), tkr, momR,
              if (s(i + 1)._3 > s(i)._3) 1L else 0L))
          }
        }
      }
    val buckets = sig.groupBy(_._1).toSeq.flatMap { case (mon, xs) =>
      val s = xs.sortBy(x => (x._3, x._2))
      val n = s.length; val q = n / 10; val rem = n % 10
      var idx = 0
      (1 to 10).flatMap { d =>
        val sz = q + (if (d <= rem) 1 else 0)
        val out = s.slice(idx, idx + sz).map(x => (d.toLong, mon, x._4))
        idx += sz; out
      }
    }
    def pool(p: ((Long, String, Long)) => Boolean) =
      buckets.filter(p).groupBy(_._1)
        .map { case (d, xs) => d -> (xs.size.toLong, xs.map(_._3).sum) }
    val train = pool(_._2 < "1996-01")
    val test = pool(_._2 >= "1996-01")
    rows.foreach { r =>
      val d = r.getLong(0)
      val (nTr, upTr) = train(d)
      val (nTe, upTe) = test(d)
      assert(r.getLong(1) === nTr)
      assert(r.getLong(2) === 1000L * upTr / nTr)
      assert(r.getLong(3) === nTe)
      assert(r.getLong(4) === 1000L * upTe / nTe)
      val gap = r.getLong(2) - r.getLong(4)
      assert(r.getLong(5) === gap && r.getLong(6) === nTe * gap * gap)
    }
  }

  // ------------------------------------------------------------------
  // Driver recomputes for the oracle-mirrored statistics (q291, q295,
  // q297, q298, q300): the DuckDB compare is structurally blind to a
  // formula error mirrored in both engine texts (the r11 q291 factor-2
  // t-stat shipped green exactly that way), so each statistic is
  // re-derived here from first principles in plain Scala folds.
  // ------------------------------------------------------------------
  private def speel(n: Long, d: Long): Long = if (n >= 0) n / d else -((-n) / d)

  /** Monthly milli returns (ticker, mon, y) recomputed driver-side from
    * the monthly_bars silver — the shared input of q291/q298/q300.
    */
  private lazy val monthlyY: Seq[(Long, String, Long)] =
    CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon".cast("string"), $"close_c")
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (tkr, xs) =>
        xs.sortBy(_._2).sliding(2).collect {
          case Seq(p, c) =>
            (tkr, c._2,
              math.floor(1000.0 * (c._3 - p._3).toDouble / p._3.toDouble).toLong)
        }
      }

  test("q291 NW: full driver recompute; t is γ̄/SE with SE=√s4/(2n) from first principles") {
    // market factor: per-month mean milli return over >= 5 names
    val mkt = monthlyY.groupBy(_._2).collect {
      case (mon, xs) if xs.size >= 5 => mon -> speel(xs.map(_._3).sum, xs.size.toLong)
    }
    // per-ticker beta over mkt months, n >= 24
    val betas = monthlyY.filter(r => mkt.contains(r._2)).groupBy(_._1).collect {
      case (tkr, xs) if xs.size >= 24 =>
        val n = xs.size.toLong
        val sx = xs.map(r => mkt(r._2)).sum; val sy = xs.map(_._3).sum
        val sxx = xs.map(r => { val x = mkt(r._2); x * x }).sum
        val sxy = xs.map(r => mkt(r._2) * r._3).sum
        tkr -> math.floor(1000.0 * (n * sxy - sx * sy).toDouble /
          (n * sxx - sx * sx).toDouble).toLong
    }
    // per-month cross-sectional premium gamma over >= 5 eligible names
    val gm = monthlyY.filter(r => betas.contains(r._1)).groupBy(_._2).collect {
      case (mon, xs) if xs.size >= 5 =>
        val nn = xs.size.toLong
        val bx = xs.map(r => betas(r._1)).sum; val by = xs.map(_._3).sum
        val bxx = xs.map(r => { val b = betas(r._1); b * b }).sum
        val bxy = xs.map(r => betas(r._1) * r._3).sum
        mon -> math.floor(1000000.0 * (nn * bxy - bx * by).toDouble /
          (nn * bxx - bx * bx).toDouble).toLong
    }
    val nM = gm.size.toLong
    val mu = speel(gm.values.sum, nM)
    val dByIdx = gm.map { case (mon, g) =>
      (mon.substring(0, 4).toInt * 12 + mon.substring(5, 7).toInt) -> (g - mu)
    }
    def gamma(l: Int): Long = dByIdx.toSeq.collect {
      case (mi, d) if dByIdx.contains(mi - l) => d * dByIdx(mi - l)
    }.sum
    val (g0, g1, g2, g3) = (gamma(0), gamma(1), gamma(2), gamma(3))
    val s4 = 4 * g0 + 6 * g1 + 4 * g2 + 2 * g3
    val r = run("q291_newey_west").collect()
    assert(r.length === 1)
    val o = r.head
    assert(o.getAs[Long]("n_months") === nM)
    assert(o.getAs[Long]("mu_micro") === mu)
    assert(o.getAs[Long]("g0") === g0 && o.getAs[Long]("g1") === g1)
    assert(o.getAs[Long]("g2") === g2 && o.getAs[Long]("g3") === g3)
    assert(o.getAs[Long]("s4") === s4)
    // first-principles t: Ŝ = s4/(4n), SE(γ̄) = √(Ŝ/n), t = γ̄/SE — an
    // INDEPENDENT derivation of the engine's 2nγ̄/√s4 (zero
    // autocorrelation ⇒ s4 = 4Γ₀ ⇒ t = γ̄·n/√Γ₀, the i.i.d. t)
    if (s4 > 0) {
      val se = math.sqrt((s4.toDouble / (4.0 * nM)) / nM)
      val tExp = mu.toDouble / se
      val tGot = o.getAs[Double]("t_nw")
      assert(math.abs(tGot - tExp) <= 1e-9 * math.max(1.0, math.abs(tExp)),
        s"t_nw $tGot != first-principles $tExp")
      // the i.i.d. reduction law on the same data: t_iid = γ̄·n/√Γ₀
      val tIid = mu.toDouble * nM / math.sqrt(g0.toDouble)
      val ratio = tGot / tIid
      val expRatio = math.sqrt(4.0 * g0.toDouble / s4.toDouble)
      assert(math.abs(ratio - expRatio) <= 1e-9, "NW/iid ratio drifts")
    } else assert(o.isNullAt(o.fieldIndex("t_nw")))
    if (g0 > 0)
      assert(o.getAs[Long]("variance_inflation_milli") === speel(1000 * s4, 4 * g0))
  }

  test("q295 KW: H, tie correction and flag recompute from a driver rank fold") {
    import org.apache.spark.sql.types.DecimalType
    val bars = WindowFeatures.bars(spark, TestSpark.Sf001)
      .select($"ticker", $"date".cast("string"),
        ($"close".cast(DecimalType(28, 2)) * 100).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
    val rets = bars.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(_._2).sliding(2).collect {
        case Seq(p, c) =>
          val rm = math.floor(1000.0 * (c._3 - p._3).toDouble / p._3.toDouble).toLong
          val dow = (java.time.LocalDate.parse(c._2).toEpochDay + 4) % 7
          (rm, dow)
      }
    }
    val grid = rets.groupBy(_._1).map { case (v, xs) => v -> xs.size.toLong }
    val mid2 = {
      var before = 0L
      grid.toSeq.sortBy(_._1).map { case (v, cnt) =>
        val m = 2 * before + cnt + 1; before += cnt; v -> m
      }.toMap
    }
    val bigN = rets.size.toLong
    val tsum = grid.values.map(c => c * c * c - c).sum
    val byDow = rets.groupBy(_._2).map { case (d, xs) =>
      d -> (xs.size.toLong, xs.map(r => mid2(r._1)).sum)
    }
    val term = byDow.values.map { case (n, r2) =>
      val rg = r2.toDouble / 2.0; rg * rg / n.toDouble
    }.sum
    val h = 12.0 / (bigN.toDouble * (bigN + 1).toDouble) * term - 3.0 * (bigN + 1).toDouble
    val tieC = 1.0 - tsum.toDouble /
      (bigN.toDouble * bigN.toDouble * bigN.toDouble - bigN.toDouble)
    val hTie = h / tieC
    val crit = Map(2 -> 3.841458820694124, 3 -> 5.991464547107979,
      4 -> 7.814727903251179, 5 -> 9.487729036781154,
      6 -> 11.070497693516351, 7 -> 12.591587243743977)
    val rows = run("q295_kruskal_wallis").collect()
    assert(rows.length === byDow.size)
    rows.foreach { r =>
      val d = r.getAs[Long]("dow")
      val (nG, r2G) = byDow(d)
      assert(r.getAs[Long]("n_g") === nG && r.getAs[Long]("r2_g") === r2G)
      assert(r.getAs[Long]("mean_rank_milli") === 500 * r2G / nG)
      assert(r.getAs[Long]("n_total") === bigN)
      assert(r.getAs[Long]("n_groups") === byDow.size.toLong)
      assert(r.getAs[Long]("tsum") === tsum)
      assert(math.abs(r.getAs[Double]("h_stat") - h) <= 1e-9 * math.max(1.0, math.abs(h)))
      assert(math.abs(r.getAs[Double]("h_tie") - hTie) <= 1e-9 * math.max(1.0, math.abs(hTie)))
      assert(r.getAs[Boolean]("kw_rejected") === (tieC > 0.0 && hTie > crit(byDow.size)))
    }
  }

  test("q297 MK: S, tie-corrected variance, continuity-corrected z and Sen's lower-median slope recompute") {
    val byT = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon".cast("string"), $"close_c")
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(_._1).filter(_._2.size >= 24)
    val exp = byT.map { case (tkr, xs) =>
      val s = xs.sortBy(_._2).map(_._3).zipWithIndex
        .map { case (c, i) => (i + 1L, c) }
      val pairs = for {
        (ia, ca) <- s; (ib, cb) <- s if ia < ib
      } yield (ia, ib, java.lang.Long.signum(cb - ca).toLong,
        speel(1000000 * (cb - ca), ib - ia))
      val n = s.size.toLong
      val sMk = pairs.map(_._3).sum
      val tieSum = s.groupBy(_._2).values
        .map { g => val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
      val var18 = n * (n - 1) * (2 * n + 5) - tieSum
      val z =
        if (sMk > 0) (sMk - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
        else if (sMk < 0) (sMk + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
        else 0.0
      val sorted = pairs.sortBy(p => (p._4, p._1, p._2))
      val sen = sorted(((pairs.size + 1) / 2 - 1).toInt)._4
      tkr -> ((n, sMk, var18, sen, z))
    }
    val rows = run("q297_mann_kendall").collect()
    assert(rows.map(_.getAs[Long]("ticker")).toSet === exp.keySet)
    rows.foreach { r =>
      val (n, sMk, var18, sen, z) = exp(r.getAs[Long]("ticker"))
      assert(r.getAs[Long]("n") === n && r.getAs[Long]("s_mk") === sMk)
      assert(r.getAs[Long]("var18") === var18)
      assert(r.getAs[Long]("sen_micro") === sen)
      assert(math.abs(r.getAs[Double]("z_mk") - z) <= 1e-12 * math.max(1.0, math.abs(z)))
      assert(r.getAs[Boolean]("trending") === (math.abs(z) > 1.959963984540054))
    }
  }

  test("q298 clusters: edges, union-find labels and census recompute on the driver") {
    val reg = Tables.supplier(spark, TestSpark.Sf001)
      .join(Tables.nation(spark, TestSpark.Sf001),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_regionkey")
      .as[(Long, Long)].collect().toMap
    val byT = monthlyY.groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(r => r._2 -> r._3).toMap }
    val tickers = byT.keys.toSeq.sorted
    val edges = for {
      i <- tickers; j <- tickers
      if i < j && reg(i) == reg(j)
      common = byT(i).keySet.intersect(byT(j).keySet).toSeq
      if common.size >= 24
      n = common.size.toLong
      xs = common.map(byT(i)); ys = common.map(byT(j))
      sx = xs.sum; sy = ys.sum
      sxx = xs.map(x => x * x).sum; syy = ys.map(y => y * y).sum
      sxy = common.map(m => byT(i)(m) * byT(j)(m)).sum
      vx = n * sxx - sx * sx; vy = n * syy - sy * sy
      if vx > 0 && vy > 0
      corr = (n * sxy - sx * sy).toDouble / math.sqrt(vx.toDouble * vy.toDouble)
      if corr >= 0.3
    } yield (i, j, math.floor(corr * 1000.0).toLong)
    // union-find; component label = min member (the engine's min-label fixpoint)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (i, j, _) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val label = nodes.map(nd => nd -> find(nd)).toMap
    val census = nodes.groupBy(label).map { case (l, ns) =>
      l -> (ns.size.toLong, ns.max)
    }
    val intra = edges.groupBy(e => label(e._1)).map { case (l, es) =>
      l -> (es.size.toLong, es.map(_._3).sum)
    }
    val rows = run("q298_corr_clusters").collect()
    assert(rows.map(_.getAs[Long]("cluster_id")).toSet === census.keySet)
    rows.foreach { r =>
      val l = r.getAs[Long]("cluster_id")
      assert(r.getAs[Long]("n_members") === census(l)._1)
      assert(r.getAs[Long]("max_ticker") === census(l)._2)
      val (nE, sC) = intra(l)
      assert(r.getAs[Long]("n_edges") === nE)
      assert(r.getAs[Long]("mean_corr_milli") === speel(sC, nE))
    }
  }

  test("q305 OU half-life: b recomputes from exact moments; half-life only in the contraction domain") {
    // q305 regresses LEVELS (not returns), so recompute from mbars closes
    val levels = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon".cast("string"), $"close_c")
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(_._1)
    val exp = levels.collect { case (t, xs) if xs.size >= 25 =>
      val s = xs.sortBy(_._2).map(_._3)
      val pairs = s.sliding(2).map { case Seq(p, c) => (p, c - p) }.toSeq
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val den = n * sxx - sx * sx
      t -> (n, den, if (den > 0) Some(
        (n * sxy - sx * sy).toDouble / den.toDouble) else None)
    }.collect { case (t, (n, den, Some(b))) if den > 0 => t -> (n, b) }
    val rows = run("q305_ou_halflife").collect()
    assert(rows.map(_.getAs[Long]("ticker")).toSet === exp.keySet)
    rows.foreach { r =>
      val (n, b) = exp(r.getAs[Long]("ticker"))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("b_micro") === math.floor(b * 1000000.0).toLong)
      assert(r.getAs[Boolean]("mean_reverting") === (b < 0.0))
      if (b < 0.0 && b > -1.0) {
        val hl = math.floor(-1000.0 * math.log(2.0) / math.log(b + 1.0)).toLong
        assert(r.getAs[Long]("halflife_milli") === hl)
        assert(hl > 0L, "half-life must be positive months")
      } else assert(r.isNullAt(r.fieldIndex("halflife_milli")))
    }
  }

  test("q306 Hurst: per-block R/S and the 3-point slope recompute from a driver fold") {
    val rows = run("q306_hurst_rs").collect()
    assert(rows.nonEmpty)
    val ys = monthlyY.groupBy(_._1)
      .map { case (t, xs) => t -> xs.sortBy(_._2).map(_._3).toVector }
    val sizes = Seq(8, 16, 32)
    rows.foreach { r =>
      val t = r.getAs[Long]("ticker")
      val series = ys(t)
      val rsByN = sizes.map { n =>
        val blocks = series.grouped(n).filter(_.size == n).toSeq
        val rsMicros = blocks.flatMap { b =>
          val m = n.toLong
          val s = b.sum
          val syy = b.map(v => v * v).sum
          val varNum = m * syy - s * s
          if (varNum <= 0) None else {
            val sigma = math.sqrt(varNum.toDouble / (m * (m - 1)).toDouble)
            val devs = b.scanLeft(0L)(_ + _).tail.zipWithIndex
              .map { case (cy, i) => m * cy - (i + 1) * s }
            val rOverM = (devs.max - devs.min).toDouble / n
            Some(math.floor(1000000.0 * rOverM / sigma).toLong)
          }
        }
        n -> (if (rsMicros.isEmpty) 0L else rsMicros.sum / rsMicros.size)
      }.toMap
      assert(r.getAs[Long]("rs8") === rsByN(8))
      assert(r.getAs[Long]("rs16") === rsByN(16))
      assert(r.getAs[Long]("rs32") === rsByN(32))
      val xs = sizes.map(n => math.log(n.toDouble))
      val xbar = xs.sum / xs.size
      val denom = xs.map(x => (x - xbar) * (x - xbar)).sum
      val slope = sizes.zip(xs).map { case (n, x) =>
        (x - xbar) * math.log(rsByN(n).toDouble / 1000000.0)
      }.sum / denom
      assert(r.getAs[Long]("hurst_milli") === math.floor(1000.0 * slope).toLong)
      val h = r.getAs[Long]("hurst_milli")
      val regime = r.getAs[String]("regime")
      assert(regime === (if (h > 550) "trending"
        else if (h < 450) "mean_reverting" else "random_walk"))
    }
  }

  test("q307 pairs backtest: position rule, P&L and cumulative sum recompute row-for-row") {
    val rows = run("q307_pairs_backtest").orderBy($"mon").collect()
    assert(rows.length >= 24)
    val (ta, tb) = (rows.head.getAs[Long]("ta"), rows.head.getAs[Long]("tb"))
    assert(rows.forall(r => r.getAs[Long]("ta") == ta && r.getAs[Long]("tb") == tb))
    // z from full-sample exact moments of the emitted spread; the rule
    // pos_t = −sign(z_{t−1})·1{|z_{t−1}| > 1.5} and P&L recompute exactly
    val spreads = rows.map(_.getAs[Long]("spread_c"))
    val n = spreads.length.toLong
    val zs = spreads.sum; val zss = spreads.map(s => s * s).sum
    val mu = zs.toDouble / n
    val sd = math.sqrt((n * zss - zs * zs).toDouble / (n * (n - 1)).toDouble)
    var cum = 0L; var inPos = 0L; var wins = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      val pos =
        if (i == 0) 0L
        else {
          val zPrev = (spreads(i - 1).toDouble - mu) / sd
          if (zPrev > 1.5) -1L else if (zPrev < -1.5) 1L else 0L
        }
      assert(r.getAs[Long]("pos") === pos, s"row $i position drifts")
      val pnl = if (i == 0) 0L else pos * (spreads(i) - spreads(i - 1))
      assert(r.getAs[Long]("pnl_c") === pnl, s"row $i pnl drifts")
      cum += pnl
      assert(r.getAs[Long]("cum_pnl_c") === cum, s"row $i cum drifts")
      if (pos != 0L) inPos += 1
      if (pnl > 0L) wins += 1
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_months") === n)
      assert(r.getAs[Long]("n_in_pos") === inPos)
      assert(r.getAs[Long]("n_wins") === wins)
      assert(r.getAs[Long]("total_pnl_c") === cum)
    }
  }

  test("q313 OOS pairs backtest: full driver recompute (screen, beta, z-moments, trades) and zero parameter leakage") {
    val pivot = java.sql.Date.valueOf("1999-01-01")
    val rows = run("q313_pairs_backtest_oos").orderBy($"mon").collect()
    assert(rows.nonEmpty, "OOS window must contain trades at fixture SF")
    // every emitted row is an OUT-OF-SAMPLE month — the walk-forward wall
    rows.foreach(r => assert(!r.getAs[java.sql.Date]("mon").before(pivot)))
    // ------- driver recompute of the ENTIRE estimation chain ----------
    val bars = CrossSection.mbars(spark, TestSpark.Sf001)
      .select($"ticker", $"mon", $"close_c")
      .as[(Long, java.sql.Date, Long)].collect()
    val reg = graft.sources.Tables.supplier(spark, TestSpark.Sf001)
      .join(graft.sources.Tables.nation(spark, TestSpark.Sf001),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_regionkey")
      .as[(Long, Long)].collect().toMap
    val byT = bars.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(x => (x._2, x._3)).sortBy(_._1.getTime)
    }
    // in-sample milli returns per ticker-month (floor of one double div)
    val retsIs: Map[Long, Map[java.sql.Date, Long]] = byT.map { case (t, ms) =>
      t -> ms.zip(ms.tail).collect {
        case ((_, p), (m, c)) if m.before(pivot) =>
          m -> math.floor(1000.0 * (c - p).toDouble / p.toDouble).toLong
      }.toMap
    }
    // region-blocked pair screen on IS months only
    val tickers = byT.keys.toSeq.sorted
    val cands = for {
      i <- tickers; j <- tickers
      if i < j && reg(i) == reg(j)
      shared = retsIs(i).keySet.intersect(retsIs(j).keySet).toSeq
      if shared.size >= 24
    } yield {
      val x = shared.map(retsIs(i)); val y = shared.map(retsIs(j))
      val n = shared.size.toLong
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val corr = if (vx > 0 && vy > 0)
        (n * sxy - sx * sy).toDouble / math.sqrt(vx.toDouble * vy.toDouble)
      else Double.NegativeInfinity
      (i, j, corr, vx > 0 && vy > 0)
    }
    val sel = cands.filter(_._4).sortBy { case (i, j, c, _) => (-c, i, j) }.head
    val (ta, tb) = (sel._1, sel._2)
    assert(rows.head.getAs[Long]("ta") === ta && rows.head.getAs[Long]("tb") === tb,
      "top-1 pair must come from the in-sample screen")
    // legs on shared months (full tape), beta + z-moments from IS only
    val mA = byT(ta).toMap; val mB = byT(tb).toMap
    val shared = mA.keySet.intersect(mB.keySet).toSeq.sortBy(_.getTime)
    val isM = shared.filter(_.before(pivot))
    val bn = isM.size.toLong
    val bx = isM.map(mB).sum; val by = isM.map(mA).sum
    val bxx = isM.map(m => mB(m) * mB(m)).sum
    val bxy = isM.map(m => mB(m) * mA(m)).sum
    val beta = math.floor(1000.0 * (bn * bxy - bx * by).toDouble /
      (bn * bxx - bx * bx).toDouble).toLong
    def speelDiv(s: Long, w: Long): Long = if (s >= 0) s / w else -((-s) / w)
    val spread = shared.map(m => m -> speelDiv(1000L * mA(m) - beta * mB(m), 1000L)).toMap
    val zIs = isM.map(spread)
    val zn = zIs.size.toLong; val zsum = zIs.sum
    val zss = zIs.map(s => s * s).sum
    val mu = zsum.toDouble / zn
    val sd = math.sqrt((zn * zss - zsum * zsum).toDouble / (zn * (zn - 1)).toDouble)
    // zero-leakage: every estimation month strictly precedes every trade
    val firstTrade = rows.head.getAs[java.sql.Date]("mon")
    assert(isM.forall(_.before(firstTrade)),
      "an estimation-window month does not precede the first trade")
    // OOS trades row-for-row (z_prev lags over the FULL spread series, so
    // the first OOS position keys off the last IS month — pre-trade info)
    val oosM = shared.filterNot(_.before(pivot))
    assert(rows.map(_.getAs[java.sql.Date]("mon")).toSeq === oosM)
    var cum = 0L; var inPos = 0L; var wins = 0L
    rows.zipWithIndex.foreach { case (r, k) =>
      val m = oosM(k)
      val idx = shared.indexOf(m)
      val prev = if (idx == 0) None else Some(shared(idx - 1))
      val pos = prev.map { pm =>
        val zPrev = (spread(pm).toDouble - mu) / sd
        if (zPrev > 1.5) -1L else if (zPrev < -1.5) 1L else 0L
      }.getOrElse(0L)
      val pnl = prev.map(pm => pos * (spread(m) - spread(pm))).getOrElse(0L)
      assert(r.getAs[Long]("beta_milli") === beta, s"row $k beta drifts")
      assert(r.getAs[Long]("spread_c") === spread(m), s"row $k spread drifts")
      assert(r.getAs[Long]("pos") === pos, s"row $k position drifts")
      assert(r.getAs[Long]("pnl_c") === pnl, s"row $k pnl drifts")
      cum += pnl
      assert(r.getAs[Long]("cum_pnl_c") === cum, s"row $k cum drifts")
      assert(r.getAs[Long]("is_months") === zn)
      if (pos != 0L) inPos += 1
      if (pnl > 0L) wins += 1
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oos_months") === oosM.size.toLong)
      assert(r.getAs[Long]("n_in_pos") === inPos)
      assert(r.getAs[Long]("n_wins") === wins)
      assert(r.getAs[Long]("total_pnl_c") === cum)
    }
  }

  test("q310 alpha decay: horizon-1 summary reconciles with q246's monthly ICs; structure sane") {
    val rows = run("q310_alpha_decay").orderBy($"horizon").collect()
    assert(rows.map(_.getAs[Long]("horizon")).toSeq === Seq(1L, 2L, 3L, 6L))
    // horizon 1 IS q246's per-month IC series — the summary must
    // reconcile exactly with that query's output
    val q246Ics = run("q246_monthly_ic").select($"ic_milli")
      .as[Long].collect()
    val h1 = rows.head
    assert(h1.getAs[Long]("n_months") === q246Ics.length.toLong)
    assert(h1.getAs[Long]("mean_ic_milli") ===
      speel(q246Ics.sum, q246Ics.length.toLong))
    assert(h1.getAs[Long]("hit_milli") ===
      1000L * q246Ics.count(_ > 0L) / q246Ics.length)
    rows.foreach { r =>
      val hit = r.getAs[Long]("hit_milli")
      assert(hit >= 0L && hit <= 1000L)
      val m = r.getAs[Long]("mean_ic_milli")
      assert(m >= -1000L && m <= 1000L, s"mean IC out of Spearman range: $m")
    }
    // longer horizons can only LOSE months (lead(h) nulls the tail)
    val months = rows.map(_.getAs[Long]("n_months"))
    assert(months.zip(months.tail).forall { case (a, b) => b <= a })
  }

  test("q300 weights: largest-remainder apportionment sums to exactly 1e6; portfolio returns recompute") {
    val byT = monthlyY.groupBy(_._1)
    val vols = byT.toSeq.collect { case (t, xs) if xs.size >= 24 =>
      val n = xs.size.toLong
      val sy = xs.map(_._3).sum; val syy = xs.map(r => r._3 * r._3).sum
      (t, n * syy - sy * sy, n)
    }.collect { case (t, num, n) if num > 0 =>
      val vol = math.floor(1000000.0 *
        math.sqrt(num.toDouble / (n * (n - 1)).toDouble)).toLong
      t -> (1000000000000L / math.max(vol, 1L))
    }
    val totalInv = vols.map(_._2).sum
    val alloc = vols.map { case (t, inv) =>
      (t, 1000000L * inv / totalInv, 1000000L * inv % totalInv)
    }
    val leftover = 1000000L - alloc.map(_._2).sum
    val ranked = alloc.sortBy(a => (-a._3, a._1)).zipWithIndex
    val weights = ranked.map { case ((t, fw, _), idx) =>
      t -> (fw + (if (idx + 1 <= leftover) 1L else 0L))
    }.toMap
    assert(weights.values.sum === 1000000L, "weight vector does not sum to 1e6")
    val monthly = monthlyY.filter(r => weights.contains(r._1)).groupBy(_._2)
      .map { case (mon, xs) =>
        val pn = xs.map(r => weights(r._1) * r._3).sum
        val sy = xs.map(_._3).sum
        mon -> (xs.size.toLong, speel(pn, 1000000L), speel(sy, xs.size.toLong))
      }
    val nMo = monthly.size.toLong
    def vol(vs: Iterable[Long]): Double = {
      val s = vs.sum; val ss = vs.map(v => v * v).sum
      math.sqrt((nMo * ss - s * s).toDouble / (nMo * (nMo - 1)).toDouble)
    }
    val ivVol = vol(monthly.values.map(_._2))
    val ewVol = vol(monthly.values.map(_._3))
    val rows = run("q300_inverse_vol").collect()
    assert(rows.length === monthly.size)
    rows.foreach { r =>
      val (nN, pm, em) = monthly(r.getAs[java.sql.Date]("mon").toString)
      assert(r.getAs[Long]("n_names") === nN)
      assert(r.getAs[Long]("port_milli") === pm)
      assert(r.getAs[Long]("ew_milli") === em)
      assert(r.getAs[Long]("n_months") === nMo)
      assert(math.abs(r.getAs[Double]("iv_vol") - ivVol) <= 1e-9 * math.max(1.0, ivVol))
      assert(math.abs(r.getAs[Double]("ew_vol") - ewVol) <= 1e-9 * math.max(1.0, ewVol))
      assert(r.getAs[Long]("vol_ratio_milli") ===
        math.floor(1000.0 * ivVol / ewVol).toLong)
    }
  }
}
