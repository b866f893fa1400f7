package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator custom-plan path (SURVEY.md
  * §7.3 tier (c): LogicalPlan + SparkStrategy + SparkPlan, registered
  * through `SparkSessionExtensions` / `spark.experimental.extraStrategies`).
  *
  * Semantics: left-outer as-of — every left row is paired with the LATEST
  * right row having equal keys and right time ≤ left time, or nulls when
  * no such row exists. The right side must be unique per (keys, time)
  * (ties would be sort-order-dependent); derived quote tables are, by
  * construction of their grouping.
  *
  * Why a custom operator: Spark has no batch as-of join, and the
  * composition fallback (operators.Temporal q62's interval-explode) needs
  * a bounded lookback to stay linear. This exec is the unbounded, exact
  * form at SortMergeJoin cost: EnsureRequirements co-partitions both
  * sides on the keys (`ClusteredDistribution`) and sorts within
  * partitions by (keys, time) (`requiredChildOrdering`), then a single
  * forward merge-scan pairs each left row with the running "best" right
  * row — O(|L| + |R|) per partition, state = ONE buffered right row, no
  * explode factor, no window shuffle. That is the 100 TB shape: one
  * co-partitioning exchange each side (none if the tables are bucketed by
  * key) and a streaming pass.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule for the custom node (SURVEY.md §7.3 tier (c)'s missing
  * piece): Catalyst's stock `PushDownPredicates` cannot see through an
  * unknown logical operator, so `asof(...).filter(p)` would evaluate `p`
  * AFTER the join — the full left side rides the co-partitioning
  * exchange and the merge-scan just to be discarded above them. This
  * rule splits the filter's conjuncts and moves every deterministic,
  * left-side-only predicate below the join, shrinking the left exchange.
  *
  * Correctness: the operator is a left-outer as-of — each left row's
  * match is a function of that row and the RIGHT side alone, never of
  * other left rows — so dropping left rows early changes nothing for the
  * survivors. Right-side predicates are NOT movable: evaluated above the
  * join they see the matched row; evaluated below they change which
  * right row is "latest ≤ t" (a filtered-out candidate would fall back
  * to an older one instead of failing the predicate). Non-deterministic
  * predicates stay put, same as stock pushdown.
  */
object PushThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through the custom node — the other half of the same
  * blind spot: stock `ColumnPruning` leaves every left and right column
  * flowing through the as-of join's exchanges and sort even when the
  * query projects two of them. When a Project sits on the join, this
  * rule narrows each child to (columns the Project references) ∪ (join
  * keys and times), so the co-partitioning shuffle carries only what the
  * query needs — at 100 TB the difference between shuffling a 2-column
  * frame and a 40-column one. Pruned child outputs keep their exprIds,
  * so the Project above rebinds unchanged; the rule is convergent (a
  * second pass finds nothing further to drop).
  */
object PruneThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Project
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, j: AsOfJoinPlan) =>
      val needed = AttributeSet(
        projectList.flatMap(_.references) ++
          j.leftKeys.flatMap(_.references) ++ j.rightKeys.flatMap(_.references) ++
          j.leftTime.references ++ j.rightTime.references)
      def prune(child: LogicalPlan): Option[LogicalPlan] = {
        val keep = child.output.filter(needed.contains)
        if (keep.size < child.output.size) Some(Project(keep, child)) else None
      }
      (prune(j.left), prune(j.right)) match {
        case (None, None) => p
        case (l, r) =>
          Project(projectList,
            j.copy(left = l.getOrElse(j.left), right = r.getOrElse(j.right)))
      }
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the join keys; EnsureRequirements inserts
  // the exchanges (or none, when the child layout already clusters — the
  // bucketed case)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // sort within partitions by (keys, time) — the merge-scan's only input
  // contract
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.length
    val outAttrs = output
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // one-row lookahead into the right side (copied out of the
        // iterator's reused buffers)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        // the running best match for the current key region
        private var best: InternalRow = _
        private var bestKey: UnsafeRow = _
        advanceRight()

        // SQL comparison semantics: a NULL key or NULL time never matches
        // (DuckDB ASOF agrees), so right rows carrying one are skipped here
        // rather than buffered as a candidate. They sort first (nulls-first
        // natural ordering), so skipping keeps the merge contract intact.
        private def advanceRight(): Unit = {
          var settled = false
          while (!settled) {
            if (rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyProj(r)
              val t = rTimeProj(r)
              if (!k.anyNull && !t.isNullAt(0)) {
                rRow = r.copy()
                rKey = k.copy()
                rTime = t.copy()
                settled = true
              }
            } else { rRow = null; rKey = null; rTime = null; settled = true }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l) // reused buffer — compared within this call only
          val lt = lTimeProj(l)
          // a left row with a NULL key or NULL time can match nothing —
          // left-outer it immediately (they also sort first, so no right
          // rows are skipped by not advancing)
          if (lk.anyNull || lt.isNullAt(0))
            return resultProj(joined(l, nullRight))
          // consume every right row at or before (lk, lt); the last one
          // with key == lk is the as-of match
          var cont = rRow != null
          while (cont) {
            val kc = keyOrd.compare(rKey, lk)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTime, lt) <= 0)) {
              if (kc == 0) { best = rRow; bestKey = rKey }
              advanceRight()
              cont = rRow != null
            } else cont = false
          }
          if (best != null && keyOrd.compare(bestKey, lk) == 0)
            resultProj(joined(l, best))
          else
            resultProj(joined(l, nullRight))
        }
      }
    }
  }
}

/** Dataset-level entry point. */
object AsOf {
  /** Left-outer as-of join: for each left row, the latest right row with
    * equal keys and `rightTimeCol ≤ leftTimeCol` (nulls when none).
    * NULL semantics match SQL equi-join / DuckDB ASOF: a NULL key or NULL
    * time on either side never matches — such left rows emit with null
    * right columns, such right rows are never candidates.
    * Right columns must not collide with left column names — alias them
    * first (which also gives them fresh exprIds, keeping self-derived
    * sides unambiguous).
    */
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keys: Seq[(String, String)],
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    ensureStrategy(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val dup = lPlan.output.map(_.name).toSet intersect rPlan.output.map(_.name).toSet
    require(dup.isEmpty, s"colliding column names: ${dup.mkString(", ")} — alias the right side")
    val node = AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol))
    org.apache.spark.sql.graft.bridge.dataset(spark, node)
  }

  /** Idempotently add the planner strategy AND the pushdown rule to a
    * live session (the `spark.sql.extensions=graft.GraftExtensions`
    * config path injects both at session build instead).
    */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    val missing = Seq(PushThroughAsOfJoin, PruneThroughAsOfJoin).filterNot(opts.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = opts ++ missing
  }
}
