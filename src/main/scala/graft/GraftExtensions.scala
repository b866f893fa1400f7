package graft

import graft.functions.DotScaledExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SURVEY.md §7.3: `SparkSessionExtensions` for
  * custom expressions/rules). Production sessions opt in with
  * `spark.sql.extensions=graft.GraftExtensions`; for already-running
  * sessions `GraftExtensions.register(spark)` installs the same functions
  * — both expose the engine's custom expressions to the SQL surface:
  *
  *   SELECT dot_scaled(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotScaledFn)
    // the native as-of join operator (plans.AsOfJoinPlan → AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // and its filter-pushdown rule — stock Catalyst can't push predicates
    // through an unknown logical node
    ext.injectOptimizerRule(_ => graft.plans.PushThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneThroughAsOfJoin)
  }
}

object GraftExtensions {
  private val dotScaledBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "dot_scaled expects exactly 2 arguments")
    DotScaledExpr(args(0), args(1))
  }

  private[graft] val dotScaledFn =
    (FunctionIdentifier("dot_scaled"),
      new ExpressionInfo(classOf[DotScaledExpr].getCanonicalName, "dot_scaled"),
      dotScaledBuilder)

  /** Install the engine functions into an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.bridge.registerFunction(
      spark, "dot_scaled", dotScaledBuilder)
}
