package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for exact squared L2 distance between two
  * long-array columns — the k-means metric (SURVEY.md §7.3: custom
  * `Expression` with `doGenCode` where hot).
  *
  * This is the single hottest kernel in the codebook family (q98 training,
  * q105 IVF assignment, q108 semantic dedup): every seeding round and
  * Lloyd's pass evaluates it n·k times over 64-element arrays. The
  * declarative `zip_with` + `aggregate` form is interpreted per element
  * and fences whole-stage codegen; this compiles to a tight primitive
  * loop.
  *
  * Semantics (lockstep with the DuckDB oracle form in Corpus:
  * `list_sum(list_transform(list_zip(xs, cs), p -> (p[1]-p[2])²))`):
  * Σ_i (a[i] − b[i])² as a long over the common prefix length; null
  * array → null. Coordinates are floor(x·1e6) scaled ints, so each term
  * is ≤ (2e6)² = 4e12 and 64 terms stay far inside long range.
  */
case class SqdLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall {
      _.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sqd_long"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqdLongExpr =
    copy(left = newLeft, right = newRight)
}
