package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the scaled-integer dot product of two
  * float-array columns (SURVEY.md §7.3: custom `Expression` with
  * `doGenCode` where hot).
  *
  * The declarative form (`zip_with` + `aggregate`) is semantically
  * identical but higher-order functions are interpreted per row —
  * allocating a lambda frame per element — and they fence whole-stage
  * codegen. This expression compiles to a tight primitive loop inside the
  * generated code, which is what the ANN/dedup hot paths (Similarity,
  * Dedup q38) want at 100 TB: per-row map work at memory bandwidth.
  *
  * Semantics (must stay in lockstep with VectorOps.dotScaledSql, the
  * DuckDB oracle form): Σ_i floor(a[i] · b[i] · 1e15) as a long, over the
  * common prefix length; null array → null. Array elements are assumed
  * non-null (embedding vectors).
  */
case class DotScaledExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall {
      _.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_scaled"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e15).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) java.lang.Math.floor(
         |    ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * 1.0E15D);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotScaledExpr =
    copy(left = newLeft, right = newRight)
}
