package graft.operators

import graft.{SparkEntry, TestSpark}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** First-principles driver recomputes for the risk/attribution family
  * (q321–q323) — the post-q291 discipline: the DuckDB compare is blind to
  * a formula error mirrored into the oracle, so each statistic is
  * re-derived here from the raw fixture with independent code (textbook
  * formulas over driver collections).
  */
class RiskSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  /** Raw per-day OHLC in cents, recomputed independently on the driver
    * from the lineitem fixture (same unique seq order as the engine).
    */
  private lazy val ohlcRows: Map[(Long, String), (Long, Long, Long, Long)] = {
    val rows = Tables.lineitem(spark, TestSpark.Sf001)
      .select($"l_suppkey", to_date($"l_shipdate").cast("string"),
        ($"l_extendedprice".cast(DecimalType(28, 2)) * 100).cast("long"),
        ($"l_orderkey" * 16 + $"l_linenumber"))
      .as[(Long, String, Long, Long)].collect()
    rows.groupBy(r => (r._1, r._2)).map { case (k, fills) =>
      val seq = fills.map(f => (f._4 * 100000000L + f._3, f._3))
      val open = seq.minBy(_._1)._2
      val close = seq.maxBy(_._1)._2
      val hi = fills.map(_._3).max
      val lo = fills.map(_._3).min
      k -> (open, close, hi, lo)
    }
  }

  test("q321 range vol: textbook estimator means recompute exactly") {
    val invFourLn2 = 1.0 / (4.0 * math.log(2.0))
    val gkB = 2.0 * math.log(2.0) - 1.0
    // per-ticker day series in date order, with prev close for cc
    val byTicker = ohlcRows.toSeq
      .map { case ((t, d), v) => (t, d, v) }
      .groupBy(_._1).map { case (t, ds) => t -> ds.sortBy(_._2) }
    case class Day(mon: String, pk: Long, gk: Long, rs: Long, cc: Option[Long])
    val days = byTicker.toSeq.flatMap { case (t, ds) =>
      ds.zipWithIndex.map { case ((_, d, (o, c, h, l)), i) =>
        val lhl = math.log(h.toDouble / l.toDouble)
        val lco = math.log(c.toDouble / o.toDouble)
        val lhc = math.log(h.toDouble / c.toDouble)
        val lho = math.log(h.toDouble / o.toDouble)
        val llc = math.log(l.toDouble / c.toDouble)
        val llo = math.log(l.toDouble / o.toDouble)
        val cc = if (i == 0) None else {
          val prev = ds(i - 1)._3._2
          val lr = math.log(c.toDouble / prev.toDouble)
          Some(math.floor(1.0e9 * (lr * lr)).toLong)
        }
        (t, Day(d.substring(0, 7),
          math.floor(1.0e9 * ((lhl * lhl) * invFourLn2)).toLong,
          math.floor(1.0e9 * ((0.5 * (lhl * lhl)) - (gkB * (lco * lco)))).toLong,
          math.floor(1.0e9 * ((lhc * lho) + (llc * llo))).toLong,
          cc))
      }
    }
    def speel(num: Long, den: Long): Long =
      if (num >= 0) num / den else -((-num) / den)
    val naive = days.groupBy { case (t, d) => (t, d.mon) }.collect {
      case ((t, mon), ds) if ds.size >= 5 =>
        val n = ds.size.toLong
        val ccs = ds.flatMap(_._2.cc)
        (t, mon) -> (n, ccs.size.toLong,
          ds.map(_._2.pk).sum / n,
          speel(ds.map(_._2.gk).sum, n),
          ds.map(_._2.rs).sum / n,
          if (ccs.nonEmpty) Some(ccs.sum / ccs.size) else None)
    }
    val got = run("q321_range_vol")
      .select($"ticker", date_format($"mon", "yyyy-MM"), $"n_days", $"n_cc",
        $"pk_var_nano", $"gk_var_nano", $"rs_var_nano", $"cc_var_nano")
      .as[(Long, String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8)))
      .toMap
    assert(got.keySet === naive.keySet)
    naive.foreach { case (k, (n, ncc, pk, gk, rs, cc)) =>
      val (gn, gncc, gpk, ggk, grs, gcc) = got(k)
      assert((gn, gncc) === ((n, ncc)), s"day counts mismatch at $k")
      assert(gpk === pk, s"parkinson mismatch at $k")
      assert(ggk === gk, s"garman–klass mismatch at $k")
      assert(grs === rs, s"rogers–satchell mismatch at $k")
      assert(gcc === cc, s"close-to-close mismatch at $k")
    }
    // Rogers–Satchell day terms are ≥ 0 by construction (h ≥ max(o,c),
    // l ≤ min(o,c)) — the structural invariant the estimator relies on
    assert(days.forall(_._2.rs >= 0L), "negative RS term")
  }

  test("q322 HHI: exact BigInt recompute + structural bounds") {
    val rows = Tables.lineitem(spark, TestSpark.Sf001)
      .select(date_format(date_trunc("month", to_date($"l_shipdate")), "yyyy-MM"),
        $"l_suppkey",
        ($"l_extendedprice".cast(DecimalType(28, 2)) * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    val naive = rows.groupBy(_._1).map { case (mon, rs) =>
      val byT = rs.groupBy(_._2).map { case (_, f) => f.map(_._3).sum }
      val sv = BigInt(byT.sum)
      val sv2 = byT.map(v => BigInt(v) * BigInt(v)).sum
      val maxv = byT.max
      mon -> (byT.size.toLong, byT.sum, maxv,
        math.floor(1.0e6 * (sv2.toDouble / (sv.toDouble * sv.toDouble))).toLong,
        math.floor(1.0e6 * ((sv.toDouble * sv.toDouble) / sv2.toDouble)).toLong,
        math.floor(1.0e6 * (maxv.toDouble / sv.toDouble)).toLong)
    }
    val got = run("q322_hhi_concentration")
      .select(date_format($"mon", "yyyy-MM"), $"n_names", $"sum_v", $"max_v",
        $"hhi_ppm", $"eff_names_micro", $"top1_share_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got.keySet === naive.keySet)
    naive.foreach { case (mon, want) =>
      assert(got(mon) === want, s"HHI row mismatch at $mon")
    }
    // bounds: 1/n ≤ HHI ≤ 1; 1 ≤ eff_names ≤ n; top1 ≥ 1/n
    got.foreach { case (mon, (n, _, _, hhi, eff, top1)) =>
      assert(hhi >= 1000000L / n - 1 && hhi <= 1000000L, s"HHI range at $mon")
      assert(eff >= 1000000L - 1 && eff <= 1000000L * n, s"eff names at $mon")
      assert(top1 * n >= 1000000L - n, s"top1 share at $mon")
    }
  }

  test("q323 Brinson: driver recompute + the attribution identity") {
    // independent rebuild of the base frame: monthly close, momentum
    // signal, quintile buckets, region
    val reg = Tables.supplier(spark, TestSpark.Sf001)
      .join(Tables.nation(spark, TestSpark.Sf001),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_regionkey")
      .as[(Long, Int)].collect().toMap
    val wT = Window.partitionBy("ticker").orderBy("mon")
    val sig = CrossSection.mbars(spark, TestSpark.Sf001)
      .withColumn("mom_c", $"close_c" - lag($"close_c", 3).over(wT))
      .withColumn("next_c", lead($"close_c", 1).over(wT))
      .filter($"mom_c".isNotNull && $"next_c".isNotNull)
      .select(date_format($"mon", "yyyy-MM"), $"ticker",
        ($"mom_c".cast("double") / $"close_c".cast("double")),
        $"close_c", $"next_c")
      .as[(String, Long, Double, Long, Long)].collect()
    case class Name(t: Long, rMilli: Long, bucket: Int, reg: Int)
    val byMon = sig.groupBy(_._1).map { case (mon, rows) =>
      // ntile(5) over (mom_r, ticker): equal buckets, remainder to first
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.length
      val base = n / 5; val rem = n % 5
      val names = sorted.zipWithIndex.map { case (r, i) =>
        // bucket of index i: first `rem` buckets have (base+1) rows
        val b =
          if (i < rem * (base + 1)) i / (base + 1) + 1
          else (i - rem * (base + 1)) / base + rem + 1
        Name(r._2,
          math.floor(1000.0 * (r._5 - r._4).toDouble / r._4.toDouble).toLong,
          b, reg(r._2))
      }
      mon -> names
    }.filter(_._2.length >= 10)
    val gotRows = run("q323_brinson_attribution")
      .select(date_format($"mon", "yyyy-MM"), $"reg", $"n_b", $"n_p",
        $"wb_ppm", $"wp_ppm", $"alloc_micro", $"select_micro", $"inter_micro")
      .as[(String, Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(gotRows.map(_._1).toSet === byMon.keySet)
    byMon.foreach { case (mon, names) =>
      val nTot = names.length.toLong
      val npTot = names.count(_.bucket == 5).toLong
      val sumAll = names.map(_.rMilli).sum
      val rb = sumAll.toDouble / (1000.0 * nTot)
      var identity = 0.0
      names.groupBy(_.reg).foreach { case (g, ns) =>
        val nB = ns.length.toLong
        val sumRb = ns.map(_.rMilli).sum
        val port = ns.filter(_.bucket == 5)
        val nP = port.length.toLong
        val sumRp = port.map(_.rMilli).sum
        val wpg = nP.toDouble / npTot
        val wbg = nB.toDouble / nTot
        val rbg = sumRb.toDouble / (1000.0 * nB)
        val rpg = if (nP == 0) rbg else sumRp.toDouble / (1000.0 * nP)
        val alloc = (wpg - wbg) * (rbg - rb)
        val sel = wbg * (rpg - rbg)
        val inter = (wpg - wbg) * (rpg - rbg)
        identity += alloc + sel + inter
        val row = gotRows.find(r => r._1 == mon && r._2 == g).get
        assert(row._3 === nB && row._4 === nP, s"counts at $mon/$g")
        assert(row._5 === math.floor(1.0e6 * wbg).toLong, s"wb at $mon/$g")
        assert(row._6 === math.floor(1.0e6 * wpg).toLong, s"wp at $mon/$g")
        assert(row._7 === math.floor(1.0e6 * alloc).toLong, s"alloc at $mon/$g")
        assert(row._8 === math.floor(1.0e6 * sel).toLong, s"select at $mon/$g")
        assert(row._9 === math.floor(1.0e6 * inter).toLong, s"inter at $mon/$g")
      }
      // Brinson–Fachler identity: effects sum to the active return rp − rb
      val rp =
        if (npTot == 0) rb
        else names.filter(_.bucket == 5).map(_.rMilli).sum.toDouble / (1000.0 * npTot)
      assert(math.abs(identity - (rp - rb)) < 1e-9,
        s"attribution identity broken at $mon")
    }
  }
}
