package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior invariants for the round-7 sketch/graph batch: integer
  * PageRank (q160), the reproducible HLL register sketch (q161), the ANN
  * recall audit (q162), and asymmetric gram containment (q163).
  */
class SketchGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  test("q160 pagerank: mass bounds, teleport floor, and the 1-1 fixed point") {
    val pr = run("q160_pagerank").collect()
    assert(pr.nonEmpty)
    val n = pr.length.toLong
    // teleport term is a hard floor; truncating div only LOSES mass, so
    // the total never exceeds the seeded n·10^6
    pr.foreach(r => assert(r.getLong(2) >= 150000L, s"rank below floor: $r"))
    val total = pr.map(_.getLong(2)).sum
    assert(total <= n * 1000000L)
    assert(total >= n * 150000L)

    // sharp invariant: an isolated degree-1–degree-1 pair is a fixed
    // point of the recurrence (each node forwards its whole mass to the
    // other: r' = 150000 + (17·10^6) div 20 = exactly 10^6)
    val deg = pr.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rank = pr.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val edges = Dedup.nearDupPairs(spark, TestSpark.Sf001)
      .select($"i", $"j").distinct().as[(Long, Long)].collect()
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val isolatedPairs = adj.filter { case (u, ns) =>
      ns.size == 1 && adj(ns.head).size == 1 && deg(u) == 1L
    }
    isolatedPairs.foreach { case (u, _) =>
      assert(rank(u) === 1000000L, s"node $u of an isolated pair drifted")
    }
    assert(isolatedPairs.nonEmpty, "fixture lost its isolated near-dup pairs")
  }

  test("q161 hll: register arithmetic bounds and estimator accuracy") {
    val rows = run("q161_hll_registers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sInt, nZero, est, exact) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      // 64 terms, each in [1, 2^41]
      assert(sInt >= 64L && sInt <= 64L * (1L << 41))
      assert(nZero >= 0L && nZero <= 64L)
      assert(est > 0.0)
      // m=64 raw-HLL relative std error is 1.04/√64 = 13%; allow 3σ on
      // groups big enough for the raw estimator's regime (no small-range
      // correction is applied by design — the audit columns expose it)
      if (exact >= 160L)
        assert(math.abs(est - exact) / exact < 0.40,
          s"estimate $est vs exact $exact out of tolerance: $r")
    }
  }

  test("q162 recall audit: hit counts bounded by K and consistent with recall") {
    val rows = run("q162_ann_recall").collect()
    assert(rows.length === 8) // one row per sampled query
    rows.foreach { r =>
      val (lsh, ivf) = (r.getLong(1), r.getLong(2))
      assert(lsh >= 0L && lsh <= 10L)
      assert(ivf >= 0L && ivf <= 10L)
      assert(r.getDouble(3) === lsh.toDouble / 10)
      assert(r.getDouble(4) === ivf.toDouble / 10)
    }
    // aggregate floor: at sf0.001 the measured recalls are ~0.20 (LSH,
    // 8 hyperplanes / 2 bands) and ~0.35 (IVF, 2-probe) — q162's whole
    // purpose is surfacing numbers like these before anyone ships the
    // index; the assertions pin the audit above zero-signal, not at a
    // flattering threshold
    assert(rows.map(_.getLong(1)).sum >= 10L, "LSH recall collapsed")
    assert(rows.map(_.getLong(2)).sum >= 16L, "IVF recall collapsed")
  }

  test("q163 containment: millis bounded, intersection bounded, threshold holds") {
    val rows = run("q163_gram_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, ni, nj, ci, cj) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(k <= math.min(ni, nj), s"intersection exceeds a side: $r")
      assert(ci <= 1000L && cj <= 1000L)
      assert(ci === 1000L * k / ni)
      assert(cj === 1000L * k / nj)
      assert(math.max(ci, cj) >= 800L)
    }
  }
}
