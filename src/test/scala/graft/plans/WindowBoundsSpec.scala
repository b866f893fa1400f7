package graft.plans

import graft.{SparkEntry, TestSpark}
import graft.operators.{Scoped, Silver}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow, WindowGroupLimit}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** The window-partition-bound CI (VERDICT r8 "Next round" #2): walk the
  * optimized plan of EVERY SparkEntry query and every Silver build at
  * fixture scale, extract each window operator's partition keys, and
  * fail on any window none of whose keys is declared bounded in
  * [[WindowBounds]]. This turns the recurring per-round "is this window
  * a 100× straggler?" audit (which caught q190/q191 in r7 and q184 in
  * r8 — both windows whose keys looked bounded and weren't) into a
  * build failure at the moment the window is introduced.
  *
  * Key normalization: synthetic projection names (`_w0`, `_we1`, …) are
  * resolved through the plan's aliases back to the source expression,
  * so declarations name real columns/expressions, never positional
  * artifacts of the planner.
  */
class WindowBoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Resolve an attribute through plan aliases to a stable key string. */
  private def keyOf(
      e: Expression, aliases: Map[ExprId, Expression],
      seen: Set[ExprId] = Set.empty): String = e match {
    case a: AttributeReference if !seen.contains(a.exprId) &&
        aliases.contains(a.exprId) &&
        (a.name.startsWith("_w") || a.name.startsWith("_group")) =>
      keyOf(aliases(a.exprId), aliases, seen + a.exprId)
    case a: Attribute => a.name
    case other => other.sql.replace("`", "")
  }

  private def aliasMap(plan: LogicalPlan): Map[ExprId, Expression] =
    plan.collectWithSubqueries { case p =>
      p.expressions.flatMap(_.collect { case al: Alias => al.exprId -> al.child })
    }.flatten.toMap

  /** (sorted partition-key set) per window operator in the plan — except
    * rank-limit windows: when the optimizer proved the group-limit prune
    * (a WindowGroupLimit child, i.e. the row_number/rank ≤ k pattern),
    * the post-shuffle partition holds ≤ k·|map partitions| rows per key
    * regardless of the key's domain, so no declaration is required.
    */
  private def hasDirectGroupLimit(p: LogicalPlan): Boolean = p match {
    case _: WindowGroupLimit => true
    case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
      hasDirectGroupLimit(pr.child)
    case _ => false
  }

  private def windowKeySets(plan: LogicalPlan): Seq[Seq[String]] = {
    val aliases = aliasMap(plan)
    plan.collectWithSubqueries {
      case w: LWindow if !hasDirectGroupLimit(w.child) =>
        w.partitionSpec.map(keyOf(_, aliases)).sorted
    }
  }

  test("every window partition key set across the full query surface is declared bounded") {
    // name -> builder, over BOTH registries the engine plans windows in
    val builders: Seq[(String, () => DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
        n -> (() => fn(spark, TestSpark.Sf001))
      } ++ Silver.tables.map(t =>
        s"silver:${t.name}" -> (() => t.build(spark, TestSpark.Sf001)))

    val undeclared = mutable.SortedMap.empty[String, mutable.SortedSet[String]]
    val unexemptGlobal = mutable.SortedSet.empty[String]
    val buildErrors = mutable.ListBuffer.empty[String]

    // the parquet boundary in Scoped.materialize / Scoped.shared hides
    // pre-write plans behind a FileScan — and that is where most windows
    // live. Rebuild every shared table under the audit hook so their
    // plans (and every materialize input's) are walked too.
    Scoped.invalidate()
    builders.foreach { case (name, mk) =>
      try {
        val audited = mutable.ListBuffer.empty[LogicalPlan]
        Scoped.planAudit = Some(p => audited.synchronized { audited += p })
        val top = try mk().queryExecution.optimizedPlan
          finally Scoped.planAudit = None
        (audited.toList :+ top).flatMap(windowKeySets).foreach { keys =>
          if (keys.isEmpty) {
            if (!WindowBounds.globalWindowExempt.contains(name))
              unexemptGlobal += name
          } else if (!WindowBounds.isBounded(keys)) {
            undeclared.getOrElseUpdate(keys.mkString(", "),
              mutable.SortedSet.empty[String]) += name
          }
        }
      } catch {
        // a query that cannot BUILD is a correctness-gate problem, not a
        // window-bound problem — record it so this spec still reports
        // the full undeclared listing instead of dying on the first one
        case e: Throwable => buildErrors += s"$name: ${e.getMessage}"
      }
    }

    assert(buildErrors.isEmpty, s"query builds failed:\n  ${buildErrors.mkString("\n  ")}")
    val report = undeclared.map { case (ks, qs) =>
      s"""BoundedKey("$ks", "<bound>", Seq(${qs.take(4).map("\"" + _ + "\"").mkString(", ")}))"""
    }.mkString("\n  ")
    assert(undeclared.isEmpty,
      s"window partition key sets with no declared bound — declare in WindowBounds:\n  $report")
    assert(unexemptGlobal.isEmpty,
      "GLOBAL (empty partitionSpec) windows without an exemption: " +
        unexemptGlobal.mkString(", ") +
        " — a single global partition is the straggler shape; either" +
        " re-plan with a bounded key or declare the input tiny in" +
        " WindowBounds.globalWindowExempt")
  }

  test("registry hygiene: keys unique, rationales and exemptions non-empty") {
    val names = WindowBounds.declared.map(_.key)
    assert(names.distinct.size === names.size, "duplicate bounding keys")
    WindowBounds.declared.foreach { k =>
      assert(k.bound.trim.nonEmpty, s"${k.key}: empty bound rationale")
      assert(k.examples.nonEmpty, s"${k.key}: no example consumers")
    }
    WindowBounds.globalWindowExempt.foreach { case (q, why) =>
      assert(why.trim.nonEmpty, s"$q: empty exemption rationale")
    }
  }
}
