package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic lexicon sentiment scorer (SURVEY.md §2.8 F7 / §2.9 X2).
  *
  * The reference scores title+body with VADER's compound score
  * (data_processing/stock_pipeline.py:139,182-188; Untitled1 · cell 6). A
  * dictionary scorer is a pure function of the token stream, so the
  * Spark-native form is an expression chain — integer lexicon sum over
  * tokens, then VADER's alpha-normalization r / sqrt(r² + 15) — not a
  * Python UDF (which would fence codegen and pushdown, SURVEY.md §4).
  *
  * The lexicon itself is pluggable; the fixture lexicon maps the synthetic
  * vocabulary (fast/slow/big/small/dup…) plus common English sentiment
  * words. Raw scores are exact integers, so every downstream distribution
  * statistic (A5) can be computed with exact arithmetic — engine-portable
  * for the DuckDB oracle replay.
  */
object SentimentLex {

  /** word → integer valence, VADER-style scale [-4, 4]. */
  val Lexicon: Seq[(String, Int)] = Seq(
    // fixture vocabulary
    "fast" -> 2, "slow" -> -2, "big" -> 1, "small" -> -1,
    "dup" -> -1, "value" -> 1, "spark" -> 1,
    // common English sentiment words (real-corpus surface)
    "good" -> 3, "great" -> 4, "excellent" -> 4, "love" -> 3, "like" -> 2,
    "bad" -> -3, "terrible" -> -4, "awful" -> -4, "hate" -> -3, "worst" -> -4)

  private val alpha = 15.0

  /** Integer raw score: sum of lexicon valences over the token array. */
  def rawScore(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, w) => acc + valence(w))

  private def valence(w: Column): Column =
    Lexicon.foldLeft(lit(0L)) { case (e, (word, v)) =>
      when(w === word, lit(v.toLong)).otherwise(e)
    }

  /** VADER compound normalization of the raw score: r / sqrt(r² + 15),
    * in (-1, 1). Pure double arithmetic over an exact integer — portable.
    */
  def compound(raw: Column): Column =
    raw.cast("double") / sqrt(raw.cast("double") * raw.cast("double") + lit(alpha))

  // ---- DuckDB-side equivalents (same fold, same arithmetic) ----

  def rawScoreSql(tokensExpr: String): String = {
    val cases = Lexicon.reverse.foldLeft("CAST(0 AS BIGINT)") {
      case (e, (word, v)) => s"CASE WHEN w = '$word' THEN CAST($v AS BIGINT) ELSE $e END"
    }
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform($tokensExpr, w -> $cases)), (a, b) -> a + b)"
  }

  def compoundSql(rawExpr: String): String =
    s"CAST($rawExpr AS DOUBLE) / sqrt(CAST($rawExpr AS DOUBLE) * CAST($rawExpr AS DOUBLE) + $alpha)"
}
