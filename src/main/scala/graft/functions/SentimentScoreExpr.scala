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

  private def stripCore(s: String): String = {
    var e = s.length
    while (e > 0 && SentimentLex.EmphasisPunct.indexOf(s.charAt(e - 1)) >= 0) e -= 1
    s.substring(0, e)
  }

  /** Two passes over the token array, all in exact 1e-5-valence integers —
    * identical arithmetic to [[SentimentLex.rawFromSql]]'s oracle form.
    *
    * Pass 1 (emphasis census): per token, strip trailing emphasis
    * punctuation to its CORE, count `!` characters (text-global, VADER's
    * punctuation emphasis), flag ALL-CAPS cores, and find the first
    * contrastive `but`. Pass 2 (scoring): per lexicon hit on the lowered
    * core, stack VADER's mechanics — caps emphasis ±0.733 (only when the
    * text is MIXED case, VADER's allcap differential), then the one-token
    * lookback (negation −0.74 multiplicative; booster ±0.293; dampener
    * clamped at zero), then the but-clause re-weighting (×½ before the
    * first `but`, ×1½ after — every term is even, so both are exact).
    * Finally the exclamation amplifier: min(n_excl, 3) × 0.292 toward the
    * sum's sign.
    */
  def score(arr: ArrayData): Long = {
    val n = arr.numElements()
    val cores = new Array[UTF8String](n)
    val caps = new Array[Boolean](n)
    var nCaps = 0
    var nWords = 0
    var nExcl = 0
    var butIdx = -1
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null) {
        val s = w.toString
        var j = 0
        while (j < s.length) { if (s.charAt(j) == '!') nExcl += 1; j += 1 }
        val core = stripCore(s)
        val lower = core.toLowerCase(java.util.Locale.ROOT)
        val upper = core.toUpperCase(java.util.Locale.ROOT)
        caps(i) = core == upper && core != lower
        if (caps(i)) nCaps += 1
        nWords += 1
        if (butIdx < 0 && lower == "but") butIdx = i
        cores(i) = UTF8String.fromString(lower)
      }
      i += 1
    }
    val capsDiff = nCaps > 0 && nCaps < nWords
    var sum = 0L
    var prev: UTF8String = null
    i = 0
    while (i < n) {
      val lw = cores(i)
      if (lw == null) {
        prev = null
      } else {
        val dBox = valences.get(lw)
        if (dBox != null && dBox.longValue() != 0L) {
          val d = dBox.longValue()
          var e = d * 10000L
          if (capsDiff && caps(i)) e += (if (d > 0) 73300L else -73300L)
          if (prev != null && negations.contains(prev)) e = -74L * (e / 100L)
          else if (prev != null && intensifiers.contains(prev))
            e += (if (d > 0) 29300L else -29300L)
          else if (prev != null && dampeners.contains(prev))
            e =
              (if (d > 0) math.max(0L, e - 29300L)
               else math.min(0L, e + 29300L))
          if (butIdx >= 0) {
            if (i < butIdx) e = e / 2L
            else if (i > butIdx) e = 3L * e / 2L
          }
          sum += e
        }
        prev = lw
      }
      i += 1
    }
    val amp = math.min(nExcl, 3).toLong * 29200L
    if (sum > 0L) sum + amp else if (sum < 0L) sum - amp else sum
  }
}
