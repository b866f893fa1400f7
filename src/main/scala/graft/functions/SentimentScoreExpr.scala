package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Context-aware VADER-style milli-valence sum as a native codegen
  * expression — the hot form of [[SentimentLex.rawScore]] (X2: "custom
  * Expression with codegen if hot", SURVEY.md §7.3 — it is hot: the
  * declarative higher-order form evaluates a ~290-branch CASE per token
  * INTERPRETED, because Spark higher-order-function lambdas never enter
  * whole-stage codegen; measured 100 s for q31 at sf0.1 vs < 1 s here).
  *
  * Semantics are defined by [[SentimentLex]] (single source of truth for
  * lexicon, negators, boosters and the scaled-integer rules) and by the
  * DuckDB oracle derived from the same tables; [[SentimentScore.score]]
  * is the compiled one-pass loop with hash lookups.
  */
case class SentimentScoreExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sentiment_raw_score"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sentiment_raw_score needs array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SentimentScore.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val scorer = ctx.addReferenceObj(
        "sentimentScorer", SentimentScore, "graft.functions.SentimentScore$")
      s"${ev.value} = $scorer.score($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): SentimentScoreExpr =
    copy(child = newChild)
}

/** The compiled scoring loop, shared by interpreted eval and codegen. */
object SentimentScore extends Serializable {

  private val valences: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](SentimentLex.Lexicon.size * 2)
    SentimentLex.Lexicon.foreach { case (w, v) =>
      m.put(UTF8String.fromString(w), Long.box(v.toLong))
    }
    m
  }
  private def toSet(ws: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](ws.size * 2)
    ws.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  private val negations = toSet(SentimentLex.Negations)
  private val intensifiers = toSet(SentimentLex.Intensifiers)
  private val dampeners = toSet(SentimentLex.Dampeners)

  /** One pass over the token array: per lexicon hit, apply the one-token
    * lookback rules (negation −0.74; booster ±0.293, dampener clamped at
    * zero) in exact milli-valence integers — identical arithmetic to
    * [[SentimentLex.rawFromSql]]'s oracle form.
    */
  def score(arr: ArrayData): Long = {
    var sum = 0L
    var prev: UTF8String = null
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w == null) {
        prev = null
      } else {
        val lw = w.toLowerCase
        val dBox = valences.get(lw)
        if (dBox != null) {
          val d = dBox.longValue()
          sum +=
            (if (prev != null && negations.contains(prev)) -74L * d
             else if (prev != null && intensifiers.contains(prev))
               (if (d > 0) d * 100L + 293L else d * 100L - 293L)
             else if (prev != null && dampeners.contains(prev))
               (if (d > 0) math.max(0L, d * 100L - 293L)
                else math.min(0L, d * 100L + 293L))
             else d * 100L)
        }
        prev = lw
      }
      i += 1
    }
    sum
  }
}
