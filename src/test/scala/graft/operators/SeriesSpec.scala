package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the Series module (q137–q140) beyond the DuckDB oracle:
  * structural properties that must hold at ANY scale, not just the values
  * the fixture happens to produce.
  */
class SeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.Sf001

  test("q137: calendar is dense — |types| x |span| rows, each type covers the full span") {
    val out = graft.SparkEntry.queries("q137_gap_fill")(spark, dir).cache()
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
    val span = ev.agg(
      (datediff(max(to_date($"ts")), min(to_date($"ts"))) + 1).as("d"))
      .as[Int].head()
    val nTypes = ev.select($"event_type").distinct().count()
    assert(out.count() === nTypes * span)
    val perType = out.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .select($"n").as[Long].collect()
    assert(perType.forall(_ === span))
    // forward fill: once a type has observed a day, filled_sum is never null
    val badFill = out
      .withColumn("seen", max(when($"is_gap" === 0, lit(1)).otherwise(0))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter($"seen" === 1 && $"filled_sum".isNull)
    assert(badFill.isEmpty)
    out.unpersist()
  }

  test("q137: observed days carry their own sum; gaps carry the previous fill") {
    val out = graft.SparkEntry.queries("q137_gap_fill")(spark, dir)
    assert(out.filter($"is_gap" === 0 && !($"filled_sum" <=> $"day_sum")).isEmpty)
    assert(out.filter($"is_gap" === 1 && $"day_sum".isNotNull).isEmpty)
  }

  test("q138: OLS residuals sum to ~0 per series (normal-equation identity)") {
    val fit = graft.SparkEntry.queries("q138_ols_trend")(spark, dir)
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
    val daily = ev.groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(28, 2))
        .cast("double")).as("y"))
    val lo = ev.agg(min(to_date($"ts")).as("lo"))
    val resid = daily.crossJoin(broadcast(lo))
      .withColumn("x", datediff($"day", $"lo").cast("double"))
      .join(fit, "event_type")
      .withColumn("r", $"y" - ($"intercept" + $"slope" * $"x"))
      .groupBy($"event_type").agg(sum($"r").as("sr"), count(lit(1)).as("n"))
    val rows = resid.select($"sr", $"n").as[(Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sr, n) => assert(math.abs(sr / n) < 1e-6) }
  }

  test("q139: versions are contiguous from 1, intervals abut, runs alternate") {
    val out = graft.SparkEntry.queries("q139_scd2_history")(spark, dir).cache()
    // contiguous versions per user
    val vCheck = out.groupBy($"user_id")
      .agg(min($"version").as("lo"), max($"version").as("hi"),
        count(lit(1)).as("n"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n")
    assert(vCheck.isEmpty)
    // exactly one open (current) interval per user; valid_from < valid_to
    assert(out.filter($"is_current" === 1).groupBy($"user_id")
      .count().filter($"count" =!= 1L).isEmpty)
    assert(out.filter($"valid_to".isNotNull && $"valid_from" >= $"valid_to").isEmpty)
    // consecutive versions never share the attribute (maximal runs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"version")
    assert(out.withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev" === $"event_type").isEmpty)
    // event conservation: run lengths sum to the filtered event count
    val total = Tables.events(spark, dir)
      .filter($"ts".isNotNull && $"user_id".isNotNull).count()
    assert(out.agg(sum($"n_events")).as[Long].head() === total)
    out.unpersist()
  }

  test("q143: grouping-sets lattice levels reconcile (cells -> marginals -> grand total)") {
    val out = graft.SparkEntry.queries("q143_grouping_sets")(spark, dir).cache()
    val cells = out.filter($"gid" === 0L)
    val flagTot = out.filter($"gid" === 1L)
    val grand = out.filter($"gid" === 3L)
    assert(grand.count() === 1)
    val totalN = grand.select($"n").as[Long].head()
    assert(cells.agg(sum($"n")).as[Long].head() === totalN)
    assert(flagTot.agg(sum($"n")).as[Long].head() === totalN)
    // per-flag marginal equals the sum of its cells, for every measure
    val rolled = cells.groupBy($"l_returnflag").agg(
      sum($"n").as("n2"), sum($"qty_cents").as("q2"), sum($"price_cents").as("p2"))
    assert(flagTot.join(rolled, "l_returnflag")
      .filter($"n" =!= $"n2" || $"qty_cents" =!= $"q2" || $"price_cents" =!= $"p2")
      .isEmpty)
    out.unpersist()
  }

  test("q144: histogram estimate lands within one bin width of the exact percentile") {
    val out = graft.SparkEntry.queries("q144_histogram_quantiles")(spark, dir).cache()
    val ev = Tables.events(spark, dir).filter($"value".isNotNull)
    val (lo, hi) = ev
      .select(($"value".cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
        .cast("long").as("c"))
      .agg(min($"c"), max($"c")).as[(Long, Long)].head()
    val binWidth = (hi - lo + 1) / 64.0 + 1
    assert(out.filter(abs($"err_p50") > binWidth).isEmpty)
    assert(out.filter(abs($"err_p90") > binWidth).isEmpty)
    assert(out.agg(sum($"n")).as[Long].head() === ev.count())
    out.unpersist()
  }

  test("q145: clip fraction bounded by 2%, winsorized sum bracketed by thresholds") {
    val out = graft.SparkEntry.queries("q145_winsorize")(spark, dir).cache()
    assert(out.filter($"n_clipped" * 100 > $"n" * 2).isEmpty)
    assert(out.filter($"wins_sum_cents" < $"n" * $"lo_cents" ||
      $"wins_sum_cents" > $"n" * $"hi_cents").isEmpty)
    assert(out.filter($"lo_cents" > $"hi_cents").isEmpty)
    out.unpersist()
  }

  test("q146: marginals reconcile and residual^2 equals the chi-square term") {
    val out = graft.SparkEntry.queries("q146_contingency_residuals")(spark, dir).cache()
    // row marginal: sum of o over dow = r; grand total n constant and = sum of o
    assert(out.groupBy($"event_type").agg(sum($"o").as("so"), max($"r").as("mr"))
      .filter($"so" =!= $"mr").isEmpty)
    val totals = out.select($"n").distinct().as[Long].collect()
    assert(totals.length === 1)
    assert(out.agg(sum($"o")).as[Long].head() === totals(0))
    assert(out.filter($"chi2_term" < 0).isEmpty)
    assert(out.filter(abs($"residual" * $"residual" - $"chi2_term") > 1e-9).isEmpty)
    out.unpersist()
  }

  test("q140: count-min never undercounts, and the sketch stays within d*w cells") {
    val out = graft.SparkEntry.queries("q140_cms_frequency")(spark, dir).cache()
    assert(out.count() === 20)
    assert(out.filter($"cms_n" < $"exact_n").isEmpty)
    assert(out.filter($"overcount" =!= $"cms_n" - $"exact_n").isEmpty)
    out.unpersist()
  }

  test("q229: dollar bars partition the tape exactly, ~T-sized, OHLC within range") {
    val T = Series.DollarBarT
    val out = graft.SparkEntry.queries("q229_dollar_bars")(spark, dir).cache()
    val ticksTotal = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey".as("ticker"))
      .agg(sum(($"l_extendedprice"
        .cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
        .cast("long")).as("total_c"), count(lit(1)).as("n"))
    // the bars PARTITION the tape: per ticker, Σ dollars_c and Σ n_ticks
    // equal the raw totals, and the last bar id is (total − 1) div T
    val recon = out.groupBy($"ticker")
      .agg(sum($"dollars_c").as("bar_c"), sum($"n_ticks").as("bar_n"),
        max($"bar_id").as("last_bar"), count(lit(1)).as("n_bars"))
      .join(ticksTotal, "ticker")
    assert(recon.filter($"bar_c" =!= $"total_c").isEmpty)
    assert(recon.filter($"bar_n" =!= $"n").isEmpty)
    assert(recon.filter($"last_bar" =!= expr(s"(total_c - 1) div $T")).isEmpty)
    // bar ids monotone ⇒ ≤ total div T + 1 bars per ticker (skips allowed,
    // never overlaps)
    assert(recon.filter($"n_bars" > expr(s"total_c div $T") + 1).isEmpty)
    // OHLC sanity: low ≤ open/close ≤ high, spans ordered
    assert(out.filter($"low_c" > $"high_c" || $"open_c" < $"low_c" ||
      $"open_c" > $"high_c" || $"close_c" < $"low_c" ||
      $"close_c" > $"high_c" || $"t_start" > $"t_end").isEmpty)
    out.unpersist()
  }

  test("q230: flow conserves notional; vpin in [0,1]; carry resolves constructed case") {
    val out = graft.SparkEntry.queries("q230_vpin_flow")(spark, dir).cache()
    // every cent is classified buy or sell — per-ticker conservation
    val ticksTotal = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey".as("ticker"))
      .agg(sum(($"l_extendedprice"
        .cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
        .cast("long")).as("total_c"))
    assert(out.groupBy($"ticker").agg(sum($"buy_c" + $"sell_c").as("f"))
      .join(ticksTotal, "ticker").filter($"f" =!= $"total_c").isEmpty)
    assert(out.filter($"vpin" < 0 || $"vpin" > 1).isEmpty)
    assert(out.filter($"oi_c" =!= abs($"buy_c" - $"sell_c")).isEmpty)
    out.unpersist()
    // the sign CARRY across a zero-change run and a day boundary, on a
    // constructed 1-ticker tape: up, flat, DOWN-into-next-day, flat —
    // signs must be (+1 default, +1, +1 carried, -1 cross-day, -1 carried)
    val tape = Seq(
      (1L, "2024-01-01", 10L, 100L), (1L, "2024-01-01", 20L, 105L),
      (1L, "2024-01-01", 30L, 105L), (1L, "2024-01-02", 40L, 95L),
      (1L, "2024-01-02", 50L, 95L))
      .toDF("l_suppkey", "d", "k", "price")
      .withColumn("l_shipdate", to_timestamp($"d"))
      .withColumn("l_orderkey", $"k").withColumn("l_linenumber", lit(1))
      .withColumn("l_extendedprice", $"price".cast("double"))
    // classify via the same machinery by writing a temp lineitem dir
    val tmp = java.nio.file.Files.createTempDirectory("graft_q230_").toString
    try {
      tape.select("l_suppkey", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_shipdate")
        .write.parquet(s"$tmp/lineitem.parquet")
      val flows = graft.SparkEntry.queries("q230_vpin_flow")(spark, tmp)
        .orderBy("bucket").collect()
      // all five trades land in bucket 0 (tiny notional), classified:
      // buys = 100+105+105 (default+up+carry), sells = 95+95 (down+carry)
      assert(flows.length === 1)
      assert(flows(0).getAs[Long]("buy_c") === 31000L)
      assert(flows(0).getAs[Long]("sell_c") === 19000L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator()
        .asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q231: weights dyadic & telescoping; constant series maps to c*sum(w); burn-in exact") {
    // the d=1/2 weights really are 2^16-dyadic and follow the recurrence
    val w = Series.ffdWeights
    assert(w.head === java.math.BigDecimal.ONE.setScale(18))
    w.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      val k = i + 1
      // b = -a * (0.5 - k + 1) / k  ⇒  b * 2k = -a * (3 - 2k) / ... exact:
      val lhs = b.multiply(new java.math.BigDecimal(2 * k))
      val rhs = a.negate.multiply(new java.math.BigDecimal(2 * (k - 1) - 1).negate)
      assert(lhs.compareTo(rhs) === 0, s"recurrence broken at k=$k")
    }
    // alternating-tail signs: w0 > 0, all later weights ≤ 0 for d∈(0,1)
    assert(w.tail.forall(_.signum() <= 0))
    // burn-in: per ticker, output rows = bar days − (K−1)
    val out = graft.SparkEntry.queries("q231_frac_diff")(spark, dir).cache()
    val days = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey".as("ticker"))
      .agg(countDistinct(to_date($"l_shipdate")).as("d"))
    assert(out.groupBy($"ticker").agg(count(lit(1)).as("n"))
      .join(days, "ticker").filter($"n" =!= $"d" - 9).isEmpty)
    // a constant price series: ffd = close_cents * Σw / — via the public
    // query on a constructed single-ticker lineitem dir
    val sumW = w.reduce(_.add(_))
    val tmp = java.nio.file.Files.createTempDirectory("graft_q231_").toString
    try {
      val const = (1 to 12).map(i => (7L, i.toLong, 1, 250.00,
        java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")))
        .toDF("l_suppkey", "l_orderkey", "l_linenumber",
          "l_extendedprice", "l_shipdate")
      const.write.parquet(s"$tmp/lineitem.parquet")
      val ffd = graft.SparkEntry.queries("q231_frac_diff")(spark, tmp)
        .select($"ffd").as[Double].collect()
      assert(ffd.length === 3) // 12 days − 9 burn-in
      val expect = new java.math.BigDecimal(25000).multiply(sumW).doubleValue()
      assert(ffd.forall(v => math.abs(v - expect) < 1e-9), ffd.toSeq.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator()
        .asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q234: split partitions the calendar; quantile rank valid; coverage bounded") {
    val out = graft.SparkEntry.queries("q234_conformal_intervals")(spark, dir).cache()
    val days = Tables.events(spark, dir).filter($"ts".isNotNull)
      .groupBy($"event_type").agg(countDistinct(to_date($"ts")).as("d"))
    // the three splits partition each series' days exactly
    assert(out.join(days, "event_type")
      .filter($"n_train" + $"n_cal" + $"n_test" =!= $"d").isEmpty)
    // 50/30/20: n_train = #{rn : 10·rn ≤ 5·d} = (5·d) div 10
    assert(out.join(days, "event_type")
      .filter($"n_train" =!= expr("(5 * d) div 10")).isEmpty)
    assert(out.filter($"cover_milli" < 0 || $"cover_milli" > 1000).isEmpty)
    // the conformal rank existed on the fixture: finite qhat, >= 0
    assert(out.filter($"qhat".isNull || $"qhat" < 0).isEmpty)
    out.unpersist()
  }

  test("q235: stream == batch minus open bars, and chunking never changes the result") {
    // streamed completed bars must equal q229's bar table minus each
    // ticker's final (still-open) bar — recomputed here in-Spark
    val batch = graft.SparkEntry.queries("q229_dollar_bars")(spark, dir)
    val lastBar = batch.groupBy($"ticker").agg(max($"bar_id").as("last_bar"))
    val expected = batch.join(lastBar, "ticker")
      .filter($"bar_id" < $"last_bar").drop("last_bar")
    val streamed = Series.streamDollarBars(spark, dir, 4)
    assert(streamed.count() === expected.count())
    assert(streamed.join(expected,
      Seq("ticker", "bar_id", "t_start", "t_end", "open_c", "high_c",
        "low_c", "close_c", "n_ticks", "dollars_c")).count()
      === expected.count())
    // batch-boundary independence: a different replay chunking emits the
    // identical bar set
    val re = Series.streamDollarBars(spark, dir, 7)
    assert(re.count() === streamed.count())
    assert(re.join(streamed,
      Seq("ticker", "bar_id", "n_ticks", "dollars_c", "close_c")).count()
      === streamed.count())
  }

  test("q236: roll spread consistent with its covariance, pair counts exact") {
    val out = graft.SparkEntry.queries("q236_roll_spread")(spark, dir).cache()
    // spread² = 4·(−cov) wherever defined; NULL exactly when cov ≥ 0
    assert(out.filter($"spread_c".isNotNull &&
      abs($"spread_c" * $"spread_c" + $"cov_cents2" * 4.0) >
        (abs($"cov_cents2") * 4.0 + 1.0) * 1e-12).isEmpty)
    assert(out.filter($"spread_c".isNull && $"cov_cents2" < 0).isEmpty)
    // pairs = bar days − 2 per ticker
    val days = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey".as("ticker"))
      .agg(countDistinct(to_date($"l_shipdate")).as("d"))
    assert(out.join(days, "ticker").filter($"n_pairs" =!= $"d" - 2).isEmpty)
    out.unpersist()
  }

  test("q237: residuals sum to zero within each (series, dow) seasonal cell") {
    val out = graft.SparkEntry.queries("q237_seasonal_decompose")(spark, dir).cache()
    // the seasonal is the detrended cell mean ⇒ cell residuals cancel
    val dowCol = datediff($"day", to_date(lit("1970-01-01"))) % 7
    assert(out.groupBy($"event_type", dowCol.as("dow"))
      .agg(sum($"resid").as("r")).filter(abs($"r") > 1e-6).isEmpty)
    // decomposition identity holds row-wise by construction
    assert(out.filter(abs($"y_d" - ($"trend" + $"seasonal" + $"resid")) > 1e-9)
      .isEmpty)
    out.unpersist()
  }

  test("q238: lambda finite; bucket pairs reconcile with q230's bucket census") {
    val lam = graft.SparkEntry.queries("q238_kyle_lambda")(spark, dir).cache()
    assert(lam.count() > 0)
    assert(lam.filter($"lambda".isNull || isnan($"lambda")).isEmpty)
    // n_buckets = q230's buckets per ticker minus the first (no Δp)
    val vb = graft.SparkEntry.queries("q230_vpin_flow")(spark, dir)
      .groupBy($"ticker").agg(count(lit(1)).as("nb"))
    assert(lam.join(vb, "ticker").filter($"n_buckets" =!= $"nb" - 1).isEmpty)
    lam.unpersist()
  }

  test("q239: benford expectations total the census, digits in 1..9, chi2 nonneg") {
    val out = graft.SparkEntry.queries("q239_benford_audit")(spark, dir).cache()
    assert(out.filter($"digit" < 1 || $"digit" > 9).isEmpty)
    assert(out.filter($"chi2_term" < 0 || $"expected" <= 0).isEmpty)
    // Σ p_d = 1 ⇒ per flag Σ expected ≈ Σ observed (float tolerance only)
    val recon = out.groupBy($"flag")
      .agg(sum($"o").as("so"), sum($"expected").as("se"))
    assert(recon.filter(abs($"se" - $"so") > $"so" * 1e-6).isEmpty)
    out.unpersist()
  }

  test("q243: AMS sketch parity identity and loose concentration") {
    val out = graft.SparkEntry.queries("q243_ams_f2")(spark, dir).collect()
    assert(out.length === 9)
    val f2 = out.head.getAs[Long]("f2_exact")
    assert(out.forall(_.getAs[Long]("f2_exact") == f2))
    // ±1 signs never change parity: y ≡ Σf (mod 2) for every replica
    val totTokens = Tables.documents(spark, dir)
      .select(sum(size(graft.functions.Portable.tokens($"text"))
        .cast("long"))).as[Long].head()
    out.foreach { r =>
      assert(math.floorMod(r.getAs[Long]("y"), 2L)
        === math.floorMod(totTokens, 2L))
      assert(r.getAs[Long]("est") >= 0)
    }
    // single AMS replicas have variance ~2·F2² — only the MEAN is loosely
    // pinned (within a generous constant factor on a fixed corpus)
    val mean = out.map(_.getAs[Long]("est")).sum / 9.0
    assert(mean > f2 / 16.0 && mean < f2 * 16.0, s"mean $mean vs F2 $f2")
  }

  test("q244: imbalance bars — threshold semantics, contiguous ids, chunk-invariant") {
    val out = Series.streamImbalanceBars(spark, dir, 4).cache()
    assert(out.count() > 0)
    // every emitted bar crossed the threshold, side matches theta's sign
    assert(out.filter(abs($"theta_c") < 20000000L).isEmpty)
    assert(out.filter(($"theta_c" > 0) =!= ($"side" === 1)).isEmpty)
    // bar ids contiguous from 1 per ticker (emitted bars never skip)
    assert(out.groupBy($"ticker")
      .agg(min($"bar_seq").as("lo"), max($"bar_seq").as("hi"),
        count(lit(1)).as("n"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n").isEmpty)
    val base = out.collect().map(_.toString).sorted
    out.unpersist()
    val re = Series.streamImbalanceBars(spark, dir, 9).collect()
      .map(_.toString).sorted
    assert(re.toSeq === base.toSeq)
  }

  test("q271: streaming VPIN — completed buckets only, exact longs, chunk-invariant") {
    val out = Series.streamVpin(spark, dir, 4).cache()
    assert(out.count() > 0)
    // oi is |buy − sell| and vpin sits in (0, 1]
    assert(out.filter($"oi_c" =!= abs($"buy_c" - $"sell_c")).isEmpty)
    assert(out.filter($"vpin" <= 0.0 || $"vpin" > 1.0).isEmpty)
    // only COMPLETED buckets emit: every emitted bucket id is strictly
    // below the ticker's final open bucket (= floor((total-1)/T))
    val tot = Series.tickTape(spark, dir)
      .groupBy($"tkr".as("ticker"))
      .agg(sum($"cents").as("total_c"))
    assert(out.join(tot, "ticker")
      .filter($"total_c" <= ($"bucket" + 1) * Series.DollarBarT).isEmpty)
    // batch-boundary independence: a different replay chunking emits the
    // identical bucket table (state carries across micro-batches exactly)
    val base = out.collect().map(_.toString).sorted
    out.unpersist()
    val re = Series.streamVpin(spark, dir, 9).collect()
      .map(_.toString).sorted
    assert(re.toSeq === base.toSeq)
  }

  test("q281: streaming Kyle lambda — running OLS equals batch prefix, chunk-invariant") {
    val out = Series.streamKyle(spark, dir, 4).cache()
    assert(out.count() > 0)
    // emissions start at the q238 minimum and n increments by exactly 1
    // per completed bucket within a ticker (the prefix property)
    assert(out.filter($"n_buckets" < 3L).isEmpty)
    import org.apache.spark.sql.expressions.Window
    val wT = Window.partitionBy("ticker").orderBy("bucket")
    assert(out
      .withColumn("dn", $"n_buckets" - lag($"n_buckets", 1).over(wT))
      .filter($"dn".isNotNull && $"dn" =!= 1L).isEmpty)
    // only COMPLETED buckets emit (q271's rule)
    val tot = Series.tickTape(spark, dir)
      .groupBy($"tkr".as("ticker"))
      .agg(sum($"cents").as("total_c"))
    assert(out.join(tot, "ticker")
      .filter($"total_c" <= ($"bucket" + 1) * Series.DollarBarT).isEmpty)
    // the FINAL emission per ticker must equal q238's batch lambda when
    // the batch is restricted to completed buckets — spot-checked via
    // the full-batch q238 only where the ticker's open bucket is empty
    // of regression influence is fixture-dependent, so the cross-check
    // here is the oracle's job; chunk-invariance is this spec's:
    val base = out.collect().map(_.toString).sorted
    out.unpersist()
    val re = Series.streamKyle(spark, dir, 9).collect()
      .map(_.toString).sorted
    assert(re.toSeq === base.toSeq)
  }

  test("q290: streaming drawdown records equal a driver fold, chunk-invariant") {
    val out = Series.streamDrawdown(spark, dir, 4).cache()
    assert(out.count() > 0)
    // ground truth: the exact record fold over the sorted deduped tape
    val tape = Series.tickTape(spark, dir)
      .select($"tkr", $"day", $"seq", $"cents")
      .distinct()
      .as[(Long, java.sql.Date, Long, Long)].collect()
    val expect = tape.groupBy(_._1).toSeq.flatMap { case (tkr, xs) =>
      var peak = 0L; var maxDd = 0L
      xs.sortBy(t => (t._2.toString, t._3)).flatMap { t =>
        peak = math.max(peak, t._4)
        val dd = peak - t._4
        if (dd > maxDd) { maxDd = dd; Some((tkr, t._2.toString, t._3, t._4, peak, dd)) }
        else None
      }
    }.sortBy(r => (r._1, r._2, r._3))
    val got = out.collect().map(r => (r.getLong(0), r.getDate(1).toString,
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(got === expect)
    // drawdown records are strictly increasing per ticker
    got.groupBy(_._1).foreach { case (_, rs) =>
      val dds = rs.sortBy(r => (r._2, r._3)).map(_._6)
      assert(dds === dds.sorted && dds.distinct.size === dds.size)
    }
    val base = out.collect().map(_.toString).sorted
    out.unpersist()
    val re = Series.streamDrawdown(spark, dir, 9).collect()
      .map(_.toString).sorted
    assert(re.toSeq === base.toSeq)
  }

  test("q229: plan is the segmented scan — day offsets broadcast, no tape-sized window") {
    // assert on the classified_flow BUILD plan (the segmented scan lives
    // there since the silver promotion), composed directly so the
    // assertion is independent of whether another suite already
    // materialized the silver parquet in this JVM (the Scoped.shared
    // cache made the old queries("q229") form order-dependent)
    val build = Series.flowFromTape(Series.tickTape(spark, dir))
    val p = build.queryExecution.executedPlan.toString
    // the chunk-offset frame must come back as a broadcast, never a
    // shuffle of the tick side onto the chunk-summary key
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(20).mkString("\n"))
    // every window in the build at a construction-bounded grain: the
    // tick-grain windows carry the chunk key (_pid), the summary windows
    // run on the ≤|partitions| chunk rows (ctkr, cday) and the daily
    // rollup (ticker) — never a tick window keyed by ticker or
    // ticker+day alone
    val buildWindows = build.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.references.map(_.name).mkString).toSet
    }
    assert(buildWindows.nonEmpty)
    assert(buildWindows.forall(ks =>
      ks.exists(_.contains("_pid")) || ks == Set("ctkr", "cday") ||
        ks == Set("ticker")),
      buildWindows.toString)
    // q229 itself reads the silver back; its own windows stay at bar or
    // rollup grain — never a tick window keyed by ticker alone
    val df = graft.SparkEntry.queries("q229_dollar_bars")(spark, dir)
    val tickWindowed = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.references.map(_.name).mkString).toSet
    }
    assert(tickWindowed.forall(ks =>
      ks == Set("ticker") || (ks.contains("tkr") && ks.contains("day"))),
      tickWindowed.toString)
  }
  test("q267 runs test: counts reconcile and z matches a driver recompute") {
    val out = graft.SparkEntry.queries("q267_runs_test")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n"); val np = r.getAs[Long]("n_pos")
      val nn = r.getAs[Long]("n_neg"); val runs = r.getAs[Long]("runs")
      assert(np + nn === n)
      assert(runs >= 1L && runs <= n)
      val e = 2.0 * np * nn / n + 1.0
      val v = (2.0 * np * nn) * (2.0 * np * nn - n) / (n.toDouble * n * (n - 1))
      val z = (runs - e) / math.sqrt(v)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
      assert(r.getAs[Boolean]("serial_dep_rejected") === (math.abs(z) > 1.96))
    }
  }
}
