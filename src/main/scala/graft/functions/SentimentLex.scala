package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic VADER-style sentiment scorer (SURVEY.md §2.8 F7 / §2.9
  * X2).
  *
  * The reference scores title+body with VADER's compound score
  * (data_processing/stock_pipeline.py:139,182-188; Untitled1 · cell 6).
  * This is the native-expression port of the three VADER mechanics that
  * dominate its behavior (Hutto & Gilbert 2014, public method):
  *
  *   1. a large word→valence lexicon (here ~290 entries at VADER-like
  *      magnitudes, stored as integer decivalences = valence × 10);
  *   2. negation: a lexicon hit preceded by a negator flips and damps its
  *      valence by VADER's factor −0.74 ("not good" scores −0.74 × 1.9);
  *   3. intensity boosters: a preceding intensifier/dampener shifts the
  *      valence magnitude by VADER's ±0.293 ("very good" = 1.9 + 0.293),
  *      clamped so a dampener never flips the sign.
  *
  * Simplification vs full VADER (documented, deliberate): one-token
  * lookback instead of a 3-token decayed window, and no punctuation/
  * ALL-CAPS emphasis — those need the raw string, not the token stream.
  *
  * All arithmetic is exact-integer at scale ×1000 (milli-valences):
  * base = 100 × decivalence; negated = −74 × decivalence (−0.74 exactly);
  * boosted = base ± 293. A dictionary scorer is a pure function of the
  * token stream, so the Spark-native form is an expression chain — never
  * a Python UDF (which would fence codegen and pushdown, SURVEY.md §4) —
  * and every downstream distribution statistic (A5) stays exact-arithmetic
  * and engine-portable for the DuckDB oracle replay.
  */
object SentimentLex {

  /** word → integer decivalence (VADER-like valence × 10). */
  val Lexicon: Seq[(String, Int)] = Seq(
    // fixture vocabulary (synthetic corpus surface)
    "fast" -> 20, "slow" -> -20, "big" -> 10, "small" -> -10,
    "dup" -> -10, "value" -> 10, "spark" -> 10,
    // positive
    "good" -> 19, "great" -> 31, "excellent" -> 27, "love" -> 32,
    "loved" -> 29, "loves" -> 27, "loving" -> 28, "like" -> 15,
    "liked" -> 17, "likes" -> 16, "awesome" -> 31, "amazing" -> 28,
    "best" -> 32, "better" -> 19, "beautiful" -> 29, "brilliant" -> 28,
    "celebrate" -> 27, "charming" -> 24, "cheerful" -> 25, "clean" -> 16,
    "clever" -> 20, "comfort" -> 15, "comfortable" -> 19, "confident" -> 22,
    "cool" -> 13, "creative" -> 19, "cute" -> 20, "delight" -> 26,
    "delighted" -> 29, "delicious" -> 27, "eager" -> 15, "easy" -> 19,
    "ecstatic" -> 31, "efficient" -> 18, "elegant" -> 21, "encourage" -> 20,
    "encouraged" -> 21, "energetic" -> 19, "enjoy" -> 22, "enjoyed" -> 23,
    "enthusiastic" -> 25, "excited" -> 23, "excitement" -> 27,
    "fabulous" -> 28, "fair" -> 16, "faith" -> 19, "fantastic" -> 26,
    "favorite" -> 21, "fine" -> 11, "flawless" -> 29, "fortunate" -> 21,
    "free" -> 19, "freedom" -> 23, "fresh" -> 13, "friendly" -> 22,
    "fun" -> 23, "funny" -> 19, "generous" -> 23, "gentle" -> 19,
    "gift" -> 17, "glad" -> 20, "glorious" -> 27, "grace" -> 16,
    "grateful" -> 25, "happy" -> 27, "happiness" -> 29, "healthy" -> 17,
    "helpful" -> 18, "honest" -> 22, "hope" -> 19, "hopeful" -> 21,
    "impressive" -> 23, "improve" -> 19, "improved" -> 20,
    "incredible" -> 26, "innovative" -> 19, "inspire" -> 22,
    "inspired" -> 24, "interesting" -> 17, "joy" -> 28, "joyful" -> 29,
    "kind" -> 19, "laugh" -> 22, "lucky" -> 24, "magnificent" -> 29,
    "marvelous" -> 28, "nice" -> 18, "optimistic" -> 23,
    "outstanding" -> 26, "peaceful" -> 23, "perfect" -> 27,
    "pleasant" -> 22, "pleased" -> 21, "pleasure" -> 26, "popular" -> 18,
    "positive" -> 23, "powerful" -> 18, "praise" -> 23, "pretty" -> 20,
    "profit" -> 19, "progress" -> 17, "promising" -> 19, "proud" -> 21,
    "reliable" -> 19, "relief" -> 19, "relieved" -> 20, "remarkable" -> 22,
    "rescue" -> 16, "respect" -> 21, "reward" -> 22, "rich" -> 21,
    "right" -> 14, "safe" -> 18, "satisfied" -> 20, "secure" -> 15,
    "smart" -> 17, "smile" -> 21, "smooth" -> 15, "special" -> 17,
    "splendid" -> 28, "strong" -> 23, "succeed" -> 24, "success" -> 27,
    "successful" -> 27, "super" -> 26, "superb" -> 29, "support" -> 17,
    "supported" -> 16, "sweet" -> 20, "talent" -> 20, "terrific" -> 28,
    "thank" -> 18, "thankful" -> 24, "thanks" -> 19, "top" -> 20,
    "triumph" -> 25, "trust" -> 21, "useful" -> 18, "valuable" -> 21,
    "victory" -> 27, "vibrant" -> 22, "warm" -> 17, "wealth" -> 21,
    "welcome" -> 20, "win" -> 28, "winner" -> 28, "winning" -> 28,
    "wonderful" -> 27, "wow" -> 26, "yes" -> 17,
    // negative
    "bad" -> -25, "terrible" -> -21, "awful" -> -20, "hate" -> -27,
    "hated" -> -29, "hates" -> -24, "worst" -> -31, "horrible" -> -25,
    "abandon" -> -19, "abuse" -> -32, "afraid" -> -22, "angry" -> -23,
    "annoy" -> -18, "annoyed" -> -20, "annoying" -> -20, "anxious" -> -12,
    "ashamed" -> -21, "attack" -> -21, "awkward" -> -13, "betray" -> -30,
    "bitter" -> -18, "blame" -> -17, "bored" -> -13, "boring" -> -13,
    "broke" -> -11, "broken" -> -17, "brutal" -> -31, "catastrophe" -> -26,
    "cheat" -> -25, "collapse" -> -18, "complain" -> -15,
    "complaint" -> -16, "concern" -> -11, "concerned" -> -12,
    "confused" -> -13, "crash" -> -15, "crazy" -> -14, "crime" -> -25,
    "crisis" -> -31, "cruel" -> -28, "cry" -> -22, "damage" -> -22,
    "danger" -> -24, "dangerous" -> -24, "dead" -> -33, "death" -> -29,
    "defeat" -> -20, "delay" -> -13, "deny" -> -16, "depressed" -> -23,
    "desperate" -> -14, "destroy" -> -27, "destroyed" -> -29, "die" -> -29,
    "difficult" -> -15, "dirty" -> -20, "disappoint" -> -22,
    "disappointed" -> -23, "disaster" -> -31, "dishonest" -> -28,
    "dislike" -> -16, "disgust" -> -29, "doubt" -> -15, "dread" -> -22,
    "dull" -> -17, "embarrassed" -> -17, "enemy" -> -23, "error" -> -17,
    "evil" -> -34, "fail" -> -25, "failed" -> -23, "failure" -> -26,
    "fake" -> -21, "fault" -> -16, "fear" -> -26, "fight" -> -16,
    "fired" -> -26, "fool" -> -19, "forget" -> -9, "fraud" -> -29,
    "frustrated" -> -24, "guilt" -> -26, "harm" -> -25, "harsh" -> -19,
    "hell" -> -27, "helpless" -> -20, "horror" -> -29, "hurt" -> -24,
    "ignore" -> -15, "ill" -> -17, "illegal" -> -26, "injured" -> -18,
    "insult" -> -23, "jealous" -> -20, "kill" -> -33, "killed" -> -30,
    "lack" -> -13, "lazy" -> -18, "lie" -> -18, "lied" -> -21,
    "lonely" -> -18, "lose" -> -24, "loss" -> -13, "lost" -> -13,
    "mad" -> -23, "mess" -> -15, "miserable" -> -26, "miss" -> -10,
    "mistake" -> -17, "negative" -> -22, "nervous" -> -12, "no" -> -12,
    "pain" -> -26, "painful" -> -25, "panic" -> -23, "pathetic" -> -25,
    "poor" -> -19, "problem" -> -17, "problems" -> -17, "punish" -> -23,
    "reject" -> -19, "rejected" -> -21, "risk" -> -11, "rude" -> -20,
    "sad" -> -21, "scam" -> -25, "scandal" -> -23, "scared" -> -22,
    "selfish" -> -24, "shame" -> -21, "sick" -> -22, "sorry" -> -5,
    "steal" -> -24, "strange" -> -9, "stress" -> -18, "stressed" -> -21,
    "struggle" -> -18, "stupid" -> -23, "suffer" -> -24,
    "suspicious" -> -15, "threat" -> -20, "tired" -> -14,
    "tragedy" -> -28, "trouble" -> -18, "ugly" -> -24, "unfair" -> -20,
    "unhappy" -> -18, "unsafe" -> -19, "upset" -> -19, "useless" -> -17,
    "victim" -> -19, "violence" -> -29, "violent" -> -29, "war" -> -29,
    "warning" -> -14, "waste" -> -18, "weak" -> -19, "worried" -> -18,
    "worry" -> -19, "wrong" -> -21)

  /** Negators: flip-and-damp the following lexicon hit by −0.74
    * (reference VADER N_SCALAR). Apostrophe-free contraction forms only —
    * the tokenizer is `\S+`, so possessive-apostrophe variants never
    * arrive as clean tokens anyway.
    */
  val Negations: Seq[String] = Seq(
    "not", "never", "none", "nobody", "nothing", "neither", "nor",
    "nowhere", "cannot", "cant", "dont", "doesnt", "didnt", "isnt",
    "arent", "wasnt", "werent", "wont", "wouldnt", "shouldnt", "couldnt",
    "aint", "without", "rarely", "seldom", "hardly", "scarcely", "barely")

  /** Intensifiers: +0.293 toward the hit's sign (VADER B_INCR). */
  val Intensifiers: Seq[String] = Seq(
    "very", "really", "extremely", "absolutely", "completely", "so",
    "too", "totally", "utterly", "incredibly", "remarkably", "especially",
    "exceptionally", "highly", "hugely", "tremendously", "deeply",
    "enormously", "entirely", "fully", "greatly", "intensely", "purely",
    "quite", "truly")

  /** Dampeners: −0.293 toward zero, clamped at zero (VADER B_DECR). */
  val Dampeners: Seq[String] = Seq(
    "slightly", "somewhat", "marginally", "partly", "partially", "kinda",
    "sorta", "almost", "nearly", "moderately", "occasionally", "mildly",
    "little", "less")

  private val alpha = 15.0
  // milli-valence scale factors: base ×100 over decivalence (= ×1000 over
  // valence); negation −0.74 × 100 = −74 exactly; booster 0.293 × 1000
  private val NegScalar = -74L
  private val BoostMilli = 293L

  /** Decivalence of a lowercased token — flat CASE over the lexicon. */
  private def valence(w: Column): Column = {
    val first = when(w === Lexicon.head._1, lit(Lexicon.head._2.toLong))
    Lexicon.tail.foldLeft(first) { case (e, (word, v)) =>
      e.when(w === word, lit(v.toLong))
    }.otherwise(lit(0L))
  }

  /** Context-aware milli-valence score of one token given its predecessor
    * (null predecessor = sentence start = no modifier).
    */
  private def tokenScore(w: Column, prev: Column): Column = {
    val d = valence(w)
    when(d === 0, lit(0L))
      .when(prev.isin(Negations: _*), lit(NegScalar) * d)
      .when(prev.isin(Intensifiers: _*),
        when(d > 0, d * 100L + BoostMilli).otherwise(d * 100L - BoostMilli))
      .when(prev.isin(Dampeners: _*),
        when(d > 0, greatest(lit(0L), d * 100L - BoostMilli))
          .otherwise(least(lit(0L), d * 100L + BoostMilli)))
      .otherwise(d * 100L)
  }

  /** Integer raw score in milli-valences: context-aware sum over the token
    * stream, as the codegen'd [[SentimentScoreExpr]] (the declarative
    * higher-order form below is kept as the semantic reference — HOF
    * lambdas evaluate interpreted, which makes the big lexicon CASE the
    * hottest loop in the engine; the native expression is a one-pass
    * hash-lookup loop inside whole-stage codegen).
    */
  def rawScore(tokens: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SentimentScoreExpr(org.apache.spark.sql.graft.bridge.expression(tokens)))

  /** The declarative HOF twin of [[rawScore]] — semantics documentation
    * and equivalence-test target, not the production path.
    */
  private[graft] def rawScoreDeclarative(tokens: Column): Column =
    aggregate(
      transform(tokens, (w, i) =>
        tokenScore(lower(w), lower(get(tokens, i - lit(1))))),
      lit(0L), (acc, s) => acc + s)

  /** VADER compound normalization of the milli-valence raw score:
    * r / sqrt(r² + 15) over the unscaled sum, in (−1, 1). Pure double
    * arithmetic over an exact integer — portable.
    */
  def compound(raw: Column): Column = {
    val r = raw.cast("double") / lit(1000.0)
    r / sqrt(r * r + lit(alpha))
  }

  // ---- DuckDB-side equivalents (same tables, same arithmetic) ----

  /** Decivalence array for a token-array expression — inline this ONCE
    * (the ~290-branch CASE is large); downstream score SQL references the
    * resulting column by name.
    */
  def valenceArraySql(toksCol: String): String = {
    val cases = Lexicon.map { case (k, v) =>
      s"WHEN '$k' THEN CAST($v AS BIGINT)" }.mkString(" ")
    s"list_transform($toksCol, w -> CASE lower(w) $cases ELSE CAST(0 AS BIGINT) END)"
  }

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Milli-valence raw score from named token/decivalence array columns
    * (`toksCol`, `dsCol`) — mirrors [[rawScore]]'s one-token lookback.
    */
  def rawFromSql(toksCol: String, dsCol: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       [CASE WHEN $dsCol[i] = 0 THEN CAST(0 AS BIGINT)
             WHEN lower($toksCol[i-1]) IN (${inList(Negations)})
               THEN $NegScalar * $dsCol[i]
             WHEN lower($toksCol[i-1]) IN (${inList(Intensifiers)})
               THEN CASE WHEN $dsCol[i] > 0 THEN $dsCol[i] * 100 + $BoostMilli
                         ELSE $dsCol[i] * 100 - $BoostMilli END
             WHEN lower($toksCol[i-1]) IN (${inList(Dampeners)})
               THEN CASE WHEN $dsCol[i] > 0
                         THEN greatest(CAST(0 AS BIGINT), $dsCol[i] * 100 - $BoostMilli)
                         ELSE least(CAST(0 AS BIGINT), $dsCol[i] * 100 + $BoostMilli) END
             ELSE $dsCol[i] * 100 END
        for i in range(1, len($toksCol) + 1)]), (a, b) -> a + b)"""

  def compoundSql(rawExpr: String): String =
    s"(CAST($rawExpr AS DOUBLE) / 1000.0) / " +
      s"sqrt((CAST($rawExpr AS DOUBLE) / 1000.0) * (CAST($rawExpr AS DOUBLE) / 1000.0) + $alpha)"
}
