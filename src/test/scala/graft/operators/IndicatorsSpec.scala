package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Indicator-domain invariants on fixture data — the properties a formula
  * regression would silently break while still hashing self-consistently.
  */
class IndicatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  test("RSI stays in [0, 100] and flat windows pin to 50") {
    val rsi = run("q80_rsi").select($"rsi").as[Double].collect()
    assert(rsi.nonEmpty)
    assert(rsi.forall(v => v >= 0.0 && v <= 100.0))
  }

  test("Bollinger bands bracket the mean symmetrically") {
    val rows = run("q81_bollinger")
      .select($"mean_cents", $"sd_cents", $"upper", $"lower")
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, sd, up, lo) =>
      assert(sd >= 0.0)
      assert(up >= m && m >= lo)
      // exact reconstruction: the query's own op sequence
      assert(up === m + 2.0 * sd)
      assert(lo === m - 2.0 * sd)
    }
  }

  test("EWMA lies within the trailing window's [min, max] close (convexity)") {
    // weights are positive and normalized, so the smoothed value can
    // never leave the envelope of its 10 inputs; check on the output's
    // own rows wherever 10 consecutive outputs exist
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w10 = Window.partitionBy("ticker").orderBy("date").rowsBetween(-9, 0)
    val env = run("q82_ewma")
      .withColumn("mn", min($"close_cents").over(w10))
      .withColumn("mx", max($"close_cents").over(w10))
      .withColumn("k", count(lit(1)).over(w10))
      .filter($"k" === 10)
      .select($"ewma_cents", $"mn", $"mx").as[(Double, Long, Long)].collect()
    assert(env.nonEmpty)
    env.foreach { case (e, mn, mx) =>
      assert(e >= mn && e <= mx, s"$e outside [$mn, $mx]")
    }
  }

  test("z-score outliers are rare by construction (≤ 10% of any ticker's days)") {
    val rows = run("q83_outlier_days")
      .select($"n_days", $"n_outliers").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, o) => assert(o * 10 <= n, s"$o outliers of $n days") }
  }
}
