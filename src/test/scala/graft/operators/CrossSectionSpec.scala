package graft.operators

import graft.{SparkEntry, TestSpark}
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
}
