package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character k-shingles of a string as a native codegen
  * expression — the MinHash front-end (Dedup q35).
  *
  * Declarative equivalent (and the DuckDB oracle form):
  * `array_distinct(transform(sequence(1, greatest(len-k+1, 1)),
  * i -> substr(text, i, k)))` — but Spark's higher-order functions are
  * interpreted per element, which makes the corpus-side shingle explode
  * the hottest interpreted loop in the engine. This compiles to a tight
  * substring+hash-set loop. Semantics match the declarative chain
  * exactly, including the k>len edge case (one partial shingle from
  * position 1).
  */
case class CharShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    val m = math.max(n - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i < m) {
      seen.add(s.substringSQL(i + 1, k))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $s.numChars();
         |int $m = java.lang.Math.max($n - $k + 1, 1);
         |java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String> $seen =
         |  new java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String>($m * 2);
         |for (int $i = 0; $i < $m; $i++) {
         |  $seen.add($s.substringSQL($i + 1, $k));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $seen.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpr =
    copy(child = newChild)
}

object CharShinglesExpr {
  def shingles(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      CharShinglesExpr(org.apache.spark.sql.graft.bridge.expression(text), k))
}
