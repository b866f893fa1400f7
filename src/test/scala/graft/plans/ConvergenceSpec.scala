package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{count, lit, max}
import graft.{SparkEntry, TestSpark}

/** The fifth invariant registry's enforcement (ConvergenceBounds): every
  * fixed-round iterative operator's residual column stays inside its
  * declared budget AT BENCH SF, and every fixpoint-or-throw loop runs to
  * completion there. Runs on sf0.1 deliberately — the budgets are
  * contracts about the scale the driver's bench gate measures, not the
  * small correctness fixtures (where residuals are trivially smaller).
  *
  * Registry hygiene mirrors JoinFanoutSpec: a declared budget whose
  * query or column no longer exists fails (stale declarations rot), and
  * every residual-named column in a declared query's schema must carry
  * a budget (a new residual column without a declared bound is exactly
  * the "observed but not enforced" gap this registry closes).
  */
class ConvergenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = ConvergenceBounds.BenchSf

  test("declared queries and residual columns exist; no residual column is undeclared") {
    val qs = SparkEntry.queries
    (ConvergenceBounds.budgets.map(_.query) ++
      ConvergenceBounds.fixpoints.map(_.query)).distinct.foreach { q =>
      assert(qs.contains(q), s"stale ConvergenceBounds declaration: $q")
    }
    ConvergenceBounds.budgets.groupBy(_.query).foreach { case (q, rows) =>
      // schema-only check at the small fixture (no execution cost)
      val cols = qs(q)(spark, graft.TestSpark.Sf001).columns.toSet
      rows.foreach(r => assert(cols.contains(r.column),
        s"stale ConvergenceBounds column: $q.${r.column}"))
      val residualLike = cols.filter(c =>
        c.endsWith("_residual") || c == "rank_delta_sum")
      val declared = rows.map(_.column).toSet
      assert(residualLike.subsetOf(declared),
        s"$q emits residual columns with no declared budget: " +
          s"${residualLike -- declared}")
    }
  }

  test("fixed-round residuals stay inside their declared budgets at bench SF") {
    ConvergenceBounds.budgets.groupBy(_.query).toSeq.sortBy(_._1)
      .foreach { case (q, rows) =>
        val df = SparkEntry.queries(q)(spark, dir)
        val aggs = count(lit(1)).as("n") +:
          rows.map(r => max(df.col(r.column)).as(r.column))
        val got = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        val n = got.getLong(0)
        rows.zipWithIndex.foreach { case (r, i) =>
          val v = got.getLong(i + 1)
          assert(v <= r.maxAbs,
            s"$q.${r.column} residual $v exceeds declared budget " +
              s"${r.maxAbs} at bench SF (per-row ${
                if (n == 0) 0.0 else v.toDouble / n}; see the" +
              " ConvergenceBounds budget policy: raise rounds and" +
              " re-baseline, or re-declare with per-node evidence)")
        }
      }
  }

  test("fixpoint-or-throw loops complete at bench SF") {
    ConvergenceBounds.fixpoints.foreach { fp =>
      // completion IS the proof: the guarded loop throws past MaxRounds
      val n = SparkEntry.queries(fp.query)(spark, dir).count()
      assert(n > 0, s"${fp.query} returned no rows at bench SF")
    }
  }
}
