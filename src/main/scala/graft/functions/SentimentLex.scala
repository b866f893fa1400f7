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
  *   1. a large word→valence lexicon (5,198 entries as of round 13, vs
  *      public VADER's ~7.5k, at VADER-like magnitudes — a hand-curated
  *      core plus morphologically derived inflections and
  *      finance/slang/emoticon batches, see [[Lexicon]] — stored as
  *      integer decivalences = valence × 10);
  *   2. negation: a lexicon hit preceded by a negator flips and damps its
  *      valence by VADER's factor −0.74 ("not good" scores −0.74 × 1.9);
  *   3. intensity boosters: a preceding intensifier/dampener shifts the
  *      valence magnitude by VADER's ±0.293 ("very good" = 1.9 + 0.293),
  *      clamped so a dampener never flips the sign.
  *
  * Since the `\\S+` tokenizer preserves case and punctuation, VADER's
  * EMPHASIS mechanics apply too (all on the token stream):
  *
  *   4. ALL-CAPS emphasis: a fully-capitalized hit in MIXED-case text
  *      gains ±0.733 toward its sign (VADER C_INCR with the allcap
  *      differential — text that is entirely caps gets no boost);
  *   5. exclamation amplification: min(count of `!` in the text, 3) ×
  *      0.292 added toward the final sum's sign (VADER's punctuation
  *      emphasis, capped);
  *   6. contrastive `but`: contributions before the first `but` are
  *      halved, contributions after it weighted 1.5× (VADER's but-check).
  *
  * Tokens are matched on their CORE — trailing emphasis punctuation
  * ([[EmphasisPunct]]) stripped — so "great!!" hits the lexicon AND
  * counts its bangs. Simplification vs full VADER (documented,
  * deliberate): one-token lookback instead of a 3-token decayed window,
  * and no question-mark amplification or idiom table.
  *
  * All arithmetic is exact-integer at scale ×100000 (1e-5 valence
  * units): base = 10000 × decivalence; caps adds ±73300; negated =
  * −74 × base/100 (exact — base is always a multiple of 100); boosted =
  * base ± 29300; but-weighting halves/1.5×-es even integers exactly;
  * the bang amplifier is 29200 per `!`. A dictionary scorer is a pure
  * function of the token stream, so the Spark-native form is an
  * expression chain — never a Python UDF (which would fence codegen and
  * pushdown, SURVEY.md §4) — and every downstream distribution statistic
  * (A5) stays exact-arithmetic and engine-portable for the DuckDB oracle
  * replay.
  */
object SentimentLex {

  /** Hand-curated word → integer decivalence (VADER-like valence × 10).
    * [[Lexicon]] below merges this with the morphologically derived and
    * domain batches; curated values win on collision.
    */
  val Curated: Seq[(String, Int)] = Seq(
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
    "worry" -> -19, "wrong" -> -21,
    // ---- expanded coverage (round 4): positive ----
    "accomplish" -> 19, "accomplished" -> 19, "achievement" -> 21,
    "admire" -> 21, "admired" -> 21, "adorable" -> 22, "adore" -> 25,
    "advantage" -> 16, "agree" -> 15, "agreeable" -> 18, "amused" -> 16,
    "amusing" -> 16, "appreciate" -> 20, "appreciated" -> 21,
    "approval" -> 18, "approve" -> 19, "attractive" -> 19, "benefit" -> 20,
    "bless" -> 21, "blessed" -> 29, "bliss" -> 27, "bonus" -> 23,
    "boost" -> 17, "brave" -> 24, "bright" -> 19, "calm" -> 13,
    "capable" -> 16, "care" -> 22, "cared" -> 20, "caring" -> 22,
    "champion" -> 26, "cherish" -> 21, "classic" -> 11, "comfy" -> 17,
    "commend" -> 19, "compassion" -> 21, "congrats" -> 26,
    "congratulations" -> 26, "courage" -> 22, "courageous" -> 25,
    "courteous" -> 19, "cozy" -> 13, "dazzling" -> 24, "dear" -> 16,
    "decent" -> 15, "dedicated" -> 17, "delightful" -> 28,
    "dependable" -> 18, "desirable" -> 18, "devoted" -> 20, "dream" -> 11,
    "dynamic" -> 14, "earnest" -> 16, "effective" -> 18, "empower" -> 18,
    "empowered" -> 19, "enchanting" -> 23, "endorse" -> 15,
    "engaging" -> 16, "enrich" -> 18, "epic" -> 20, "exceptional" -> 24,
    "exciting" -> 23, "exquisite" -> 26, "faithful" -> 21, "famous" -> 17,
    "fancy" -> 13, "fascinating" -> 22, "favor" -> 17, "fearless" -> 20,
    "festive" -> 20, "fit" -> 13, "flourish" -> 21, "fond" -> 18,
    "forgive" -> 15, "forgiven" -> 16, "fortune" -> 21, "freely" -> 15,
    "friendship" -> 22, "fulfilled" -> 21, "gain" -> 15, "gained" -> 16,
    "genius" -> 24, "genuine" -> 17, "gifted" -> 20, "glow" -> 14,
    "golden" -> 16, "goodness" -> 21, "gorgeous" -> 27, "graceful" -> 19,
    "gracious" -> 20, "grand" -> 19, "gratitude" -> 21, "greatest" -> 32,
    "grin" -> 16, "growth" -> 16, "handsome" -> 22, "harmony" -> 20,
    "heal" -> 17, "healed" -> 18, "heartfelt" -> 19, "heaven" -> 23,
    "heavenly" -> 25, "hero" -> 26, "heroic" -> 26, "honor" -> 22,
    "honored" -> 23, "hug" -> 18, "humble" -> 12, "humor" -> 16,
    "ideal" -> 21, "important" -> 11, "improvement" -> 19,
    "innocent" -> 13, "inspiring" -> 24, "intelligent" -> 21,
    "inviting" -> 16, "jolly" -> 22, "jubilant" -> 27, "justice" -> 19,
    "keen" -> 14, "laughed" -> 21, "laughter" -> 23, "legendary" -> 21,
    "liberty" -> 19, "lively" -> 18, "lovable" -> 25, "lovely" -> 26,
    "lover" -> 21, "loyal" -> 19, "luckily" -> 21, "luxury" -> 20,
    "masterpiece" -> 25, "mature" -> 14, "merit" -> 15, "merry" -> 23,
    "mighty" -> 17, "miracle" -> 26, "motivated" -> 18, "neat" -> 16,
    "noble" -> 20, "nurture" -> 16, "okay" -> 9, "opportunity" -> 16,
    "paradise" -> 28, "passion" -> 20, "passionate" -> 21, "patient" -> 13,
    "peace" -> 25, "perfection" -> 28, "playful" -> 19, "polite" -> 18,
    "precious" -> 21, "prestige" -> 17, "prize" -> 21, "productive" -> 17,
    "prosper" -> 22, "prosperity" -> 23, "protect" -> 15,
    "protected" -> 16, "radiant" -> 22, "recommend" -> 15,
    "recommended" -> 16, "refresh" -> 14, "refreshing" -> 18,
    "rejoice" -> 25, "resilient" -> 18, "resolve" -> 13, "respected" -> 22,
    "restore" -> 13, "robust" -> 14, "romantic" -> 20, "satisfy" -> 18,
    "satisfying" -> 20, "save" -> 12, "saved" -> 14, "savior" -> 22,
    "sensational" -> 24, "serene" -> 20, "share" -> 12, "shine" -> 16,
    "shiny" -> 14, "sincere" -> 18, "skilled" -> 16, "skillful" -> 17,
    "soothe" -> 15, "soothing" -> 17, "spectacular" -> 26, "stable" -> 12,
    "stellar" -> 23, "stunning" -> 24, "sublime" -> 23, "succeeded" -> 23,
    "superior" -> 19, "supportive" -> 19, "supreme" -> 22,
    "surprised" -> 10, "sustain" -> 11, "tender" -> 16, "thrilled" -> 27,
    "thrilling" -> 25, "tidy" -> 14, "tolerant" -> 15, "tranquil" -> 19,
    "treasure" -> 21, "treat" -> 14, "trusted" -> 20, "truthful" -> 19,
    "upbeat" -> 19, "uplift" -> 19, "uplifting" -> 21, "usable" -> 12,
    "vital" -> 13, "vivid" -> 14, "wealthy" -> 20, "welcomed" -> 19,
    "wellness" -> 18, "wholesome" -> 18, "wise" -> 19, "wisdom" -> 20,
    "won" -> 27, "worthy" -> 17, "yay" -> 26, "youthful" -> 14,
    "zeal" -> 17, "zest" -> 17,
    // ---- expanded coverage (round 4): negative ----
    "abandoned" -> -20, "abysmal" -> -26, "accident" -> -19,
    "accuse" -> -18, "accused" -> -19, "ache" -> -17, "addict" -> -17,
    "addicted" -> -18, "adverse" -> -16, "aggravate" -> -19,
    "aggressive" -> -12, "agonizing" -> -27, "agony" -> -27,
    "alarm" -> -14, "alarming" -> -17, "alone" -> -10, "anger" -> -25,
    "anguish" -> -25, "annoyance" -> -18, "apathetic" -> -12,
    "appalling" -> -25, "arrogant" -> -21, "assault" -> -24,
    "atrocious" -> -27, "ban" -> -14, "banned" -> -16, "bankrupt" -> -25,
    "beaten" -> -18, "betrayal" -> -29, "betrayed" -> -29, "bias" -> -11,
    "biased" -> -13, "bizarre" -> -10, "bleak" -> -18, "bothered" -> -15,
    "breakdown" -> -19, "bribe" -> -21, "bully" -> -24, "burden" -> -16,
    "burn" -> -16, "burned" -> -17, "careless" -> -16, "chaos" -> -21,
    "chaotic" -> -20, "cheap" -> -10, "cheated" -> -26, "clumsy" -> -14,
    "cold" -> -9, "complained" -> -16, "conflict" -> -17, "confuse" -> -13,
    "confusing" -> -13, "corrupt" -> -26, "corruption" -> -26,
    "coward" -> -20, "crashed" -> -16, "creepy" -> -19, "cried" -> -21,
    "criminal" -> -24, "critical" -> -12, "criticize" -> -15,
    "criticized" -> -16, "crude" -> -14, "cursed" -> -22, "cynical" -> -14,
    "damaged" -> -22, "damn" -> -16, "dark" -> -10, "deadly" -> -28,
    "debt" -> -19, "deceive" -> -23, "deceived" -> -24, "deception" -> -23,
    "decline" -> -13, "declined" -> -14, "defect" -> -17,
    "defective" -> -19, "deficit" -> -15, "degrade" -> -19,
    "dejected" -> -20, "demolish" -> -17, "denied" -> -17,
    "depress" -> -21, "depressing" -> -22, "depression" -> -23,
    "deprive" -> -18, "desolate" -> -20, "despair" -> -24,
    "despise" -> -26, "destruction" -> -25, "destructive" -> -24,
    "deteriorate" -> -18, "devastate" -> -27, "devastated" -> -28,
    "devastating" -> -28, "dictator" -> -22, "dire" -> -18,
    "disadvantage" -> -16, "disagree" -> -12, "disappointing" -> -22,
    "disapprove" -> -15, "discourage" -> -17, "discouraged" -> -18,
    "disgrace" -> -22, "disgraceful" -> -23, "disgusted" -> -27,
    "disgusting" -> -28, "dismal" -> -20, "dismiss" -> -12,
    "disorder" -> -15, "dispute" -> -13, "disrupt" -> -14,
    "distress" -> -21, "distressed" -> -22, "disturb" -> -16,
    "disturbed" -> -18, "disturbing" -> -19, "divorce" -> -16,
    "doom" -> -23, "doomed" -> -25, "downfall" -> -19, "drastic" -> -12,
    "dreadful" -> -25, "drown" -> -22, "drunk" -> -14, "dying" -> -27,
    "embarrassing" -> -17, "emergency" -> -17, "endanger" -> -20,
    "enrage" -> -24, "enraged" -> -26, "erode" -> -12, "erratic" -> -13,
    "excluded" -> -14, "exhausted" -> -16, "exploit" -> -19,
    "exploited" -> -20, "explode" -> -16, "explosion" -> -16,
    "fatal" -> -26, "fatigue" -> -14, "faulty" -> -17, "fearful" -> -22,
    "feeble" -> -15, "fell" -> -9, "fiasco" -> -21, "filthy" -> -22,
    "flaw" -> -15, "flawed" -> -17, "flee" -> -14, "foolish" -> -17,
    "forbidden" -> -14, "forced" -> -12, "forgotten" -> -12,
    "foul" -> -19, "fragile" -> -11, "fright" -> -20, "frightened" -> -22,
    "frightening" -> -23, "frustrating" -> -23, "frustration" -> -23,
    "furious" -> -27, "fury" -> -26, "gloom" -> -20, "gloomy" -> -20,
    "greed" -> -22, "greedy" -> -23, "grief" -> -24, "grim" -> -19,
    "gross" -> -19, "gruesome" -> -25, "harmed" -> -24, "harmful" -> -24,
    "hassle" -> -15, "hatred" -> -30, "hazard" -> -18, "hazardous" -> -19,
    "heartbreaking" -> -26, "heartbroken" -> -27, "hideous" -> -24,
    "hopeless" -> -23, "horrendous" -> -27, "horrific" -> -28,
    "horrified" -> -27, "hostile" -> -22, "humiliate" -> -24,
    "humiliated" -> -25, "humiliating" -> -25, "hunger" -> -15,
    "hungry" -> -10, "hurting" -> -23, "hysteria" -> -18, "idiot" -> -23,
    "idiotic" -> -23, "ignorant" -> -18, "ignored" -> -16,
    "immoral" -> -22, "impatient" -> -12, "impossible" -> -13,
    "inability" -> -13, "inadequate" -> -16, "incompetent" -> -20,
    "inconvenient" -> -13, "indifferent" -> -9, "inferior" -> -17,
    "infuriate" -> -25, "injury" -> -18, "injustice" -> -22,
    "insane" -> -17, "insecure" -> -15, "insulted" -> -23,
    "insulting" -> -23, "intimidate" -> -20, "irrational" -> -14,
    "irritate" -> -19, "irritated" -> -20, "irritating" -> -21,
    "isolated" -> -13, "jail" -> -19, "jeopardy" -> -18, "junk" -> -16,
    "lame" -> -16, "lament" -> -17, "liar" -> -26, "limitation" -> -11,
    "limited" -> -9, "losing" -> -22, "lying" -> -23, "malicious" -> -25,
    "manipulate" -> -17, "manipulated" -> -18, "meltdown" -> -20,
    "menace" -> -20, "messy" -> -15, "misery" -> -26, "mislead" -> -19,
    "misleading" -> -20, "mock" -> -17, "mocked" -> -18, "monster" -> -19,
    "mourn" -> -21, "murder" -> -31, "murdered" -> -31, "nasty" -> -24,
    "naughty" -> -12, "neglect" -> -19, "neglected" -> -20,
    "nightmare" -> -25, "noisy" -> -11, "nonsense" -> -15,
    "obnoxious" -> -21, "offend" -> -18, "offended" -> -19,
    "offensive" -> -21, "oppress" -> -22, "oppressed" -> -22,
    "outrage" -> -24, "outraged" -> -25, "outrageous" -> -21,
    "overdue" -> -11, "overwhelm" -> -13, "overwhelmed" -> -14,
    "painfully" -> -24, "panicked" -> -23, "paranoid" -> -17,
    "pessimistic" -> -16, "petty" -> -13, "pity" -> -14, "plague" -> -21,
    "pointless" -> -16, "poison" -> -23, "poisoned" -> -24,
    "pollute" -> -18, "polluted" -> -19, "pollution" -> -18,
    "poverty" -> -21, "powerless" -> -17, "prejudice" -> -20,
    "pressure" -> -11, "prison" -> -20, "problematic" -> -16,
    "protest" -> -11, "punished" -> -22, "punishment" -> -22,
    "rage" -> -25, "reckless" -> -19, "refuse" -> -14, "refused" -> -15,
    "regret" -> -18, "regretful" -> -19, "resent" -> -19,
    "resentment" -> -20, "restless" -> -11, "retreat" -> -10,
    "revenge" -> -20, "ridicule" -> -19, "ridiculous" -> -17,
    "rigged" -> -19, "riot" -> -19, "rot" -> -18, "rotten" -> -21,
    "ruin" -> -22, "ruined" -> -24, "ruthless" -> -23, "sabotage" -> -21,
    "sarcastic" -> -12, "savage" -> -19, "scare" -> -20, "scary" -> -21,
    "scream" -> -16, "screamed" -> -17, "severe" -> -16, "shady" -> -15,
    "shaky" -> -12, "shocked" -> -14, "shocking" -> -16, "shortage" -> -14,
    "sin" -> -18, "sinister" -> -21, "skeptical" -> -11, "slam" -> -13,
    "slammed" -> -14, "slave" -> -24, "sloppy" -> -15, "sluggish" -> -13,
    "smash" -> -12, "smashed" -> -13, "sneaky" -> -13, "sob" -> -19,
    "somber" -> -14, "spite" -> -18, "spiteful" -> -21, "squander" -> -17,
    "stale" -> -11, "starve" -> -22, "starving" -> -21, "stink" -> -18,
    "stinks" -> -19, "stolen" -> -21, "strain" -> -13, "stranded" -> -15,
    "stressful" -> -20, "strict" -> -9, "stricken" -> -17, "stuck" -> -12,
    "substandard" -> -16, "suck" -> -19, "sucks" -> -20, "sue" -> -14,
    "sued" -> -15, "suffering" -> -25, "suicide" -> -26, "suspect" -> -12,
    "swindle" -> -22, "tamper" -> -14, "tantrum" -> -16, "tarnish" -> -15,
    "tears" -> -15, "tense" -> -13, "tension" -> -14, "terribly" -> -22,
    "terrified" -> -26, "terrifying" -> -27, "terror" -> -28,
    "terrorist" -> -31, "theft" -> -22, "thief" -> -22, "threaten" -> -21,
    "threatened" -> -22, "threatening" -> -23, "timid" -> -11,
    "torture" -> -28, "tortured" -> -28, "toxic" -> -23, "tragic" -> -26,
    "trapped" -> -17, "trauma" -> -23, "traumatic" -> -24,
    "troubled" -> -19, "troubling" -> -19, "tumble" -> -10,
    "turmoil" -> -19, "unacceptable" -> -19, "unbearable" -> -22,
    "uncertain" -> -11, "uncomfortable" -> -15, "undermine" -> -15,
    "undesirable" -> -16, "uneasy" -> -14, "unethical" -> -21,
    "unfortunate" -> -17, "unfortunately" -> -16, "unforgiving" -> -18,
    "unhealthy" -> -17, "unjust" -> -20, "unlucky" -> -17,
    "unpleasant" -> -18, "unpopular" -> -15, "unreliable" -> -17,
    "unstable" -> -15, "unsuccessful" -> -19, "unwanted" -> -16,
    "unwelcome" -> -16, "upsetting" -> -20, "urgent" -> -10, "vague" -> -9,
    "vain" -> -14, "vengeance" -> -20, "vicious" -> -24, "vile" -> -26,
    "villain" -> -22, "vulnerable" -> -12, "warned" -> -14, "weary" -> -14,
    "weep" -> -20, "wicked" -> -21, "withdraw" -> -10, "woe" -> -19,
    "worthless" -> -21, "wound" -> -20, "wounded" -> -21, "wreck" -> -19,
    "wrecked" -> -20)

  // duplicate keys in the hand-curated list are author errors — refuse at
  // class-init (the merged Lexicon dedupes derived/domain entries by
  // construction, curated values winning)
  require(Curated.map(_._1).distinct.size == Curated.size, {
    val dups = Curated.groupBy(_._1).collect { case (w, vs) if vs.size > 1 => w }
    s"duplicate lexicon keys: ${dups.mkString(", ")}"
  })

  // ---------------------------------------------------------------------
  // Lexicon breadth (round 5). The published VADER lexicon (~7.5k
  // entries) is not present in this container and there is no network to
  // fetch it, so full-file parity is unreachable offline; breadth comes
  // instead from (a) rule-based morphological derivation over POS-tagged
  // sentiment stems — the standard lexicon-expansion technique (inflected
  // forms carry their stem's valence, which matches VADER's own practice
  // of near-identical scores across inflections), (b) a finance/
  // markets-forum batch matching the reference's r/wallstreetbets corpus
  // (stock_pipeline.py:139), and (c) slang + emoticon tokens (the \S+
  // tokenizer delivers ":)" as a clean token). Every derived form is
  // generated from an explicitly tagged stem via standard English
  // spelling rules, so the list stays real words with deterministic
  // exact-integer valences on both engines.
  // ---------------------------------------------------------------------

  /** Verb stems (infinitive, decivalence) that inflect regularly; each
    * contributes base, 3rd-person -s, past -ed, and gerund -ing forms.
    */
  private[graft] val VerbStems: Seq[(String, Int)] = Seq(
    // positive
    "applaud" -> 17, "assist" -> 15, "attain" -> 16, "captivate" -> 20,
    "collaborate" -> 14, "compliment" -> 19, "conquer" -> 16,
    "cooperate" -> 14, "cure" -> 19, "dazzle" -> 21, "dedicate" -> 15,
    "elevate" -> 14, "embrace" -> 16, "enchant" -> 21, "endear" -> 16,
    "energize" -> 17, "enhance" -> 16, "enlighten" -> 18,
    "entertain" -> 16, "excel" -> 20, "excite" -> 21, "flatter" -> 13,
    "gratify" -> 18, "greet" -> 12, "guide" -> 12, "help" -> 17,
    "illuminate" -> 13, "impress" -> 20, "innovate" -> 16,
    "invigorate" -> 18, "liberate" -> 18, "mentor" -> 14,
    "motivate" -> 17, "nourish" -> 16, "please" -> 18, "prevail" -> 17,
    "promote" -> 14, "reassure" -> 16, "recover" -> 15,
    "rejuvenate" -> 18, "relax" -> 16, "relish" -> 17, "renew" -> 13,
    "repair" -> 12, "revive" -> 15, "sparkle" -> 17, "stabilize" -> 12,
    "strengthen" -> 15, "thrive" -> 21, "unite" -> 15, "volunteer" -> 14,
    "accelerate" -> 10, "adorn" -> 12, "advocate" -> 11, "affirm" -> 13,
    "amaze" -> 25, "amuse" -> 16, "astonish" -> 17, "attract" -> 13,
    "beam" -> 14, "befriend" -> 16, "bloom" -> 16, "blossom" -> 17,
    "brighten" -> 17, "charm" -> 18, "cheer" -> 21, "clarify" -> 10,
    "console" -> 12, "cultivate" -> 11, "donate" -> 15, "ease" -> 13,
    "educate" -> 12, "embolden" -> 14, "enliven" -> 16, "enrapture" -> 22,
    "entice" -> 12, "exhilarate" -> 22, "fascinate" -> 19, "foster" -> 12,
    "glisten" -> 12, "gleam" -> 12, "hearten" -> 16, "intrigue" -> 12,
    "jest" -> 10, "mend" -> 12, "pamper" -> 14, "perfect" -> 21,
    "persevere" -> 15, "polish" -> 10, "redeem" -> 13, "refine" -> 11,
    "reunite" -> 16, "revitalize" -> 17, "salute" -> 14, "savor" -> 16,
    "shelter" -> 11, "simplify" -> 10, "soar" -> 17, "succor" -> 13,
    "surpass" -> 15, "sustain" -> 11, "tempt" -> 8, "toast" -> 11,
    "upgrade" -> 14, "validate" -> 11, "venerate" -> 16, "vindicate" -> 13,
    // negative
    "afflict" -> -19, "alienate" -> -17, "ambush" -> -20,
    "antagonize" -> -18, "argue" -> -12, "belittle" -> -18,
    "blunder" -> -16, "boycott" -> -14, "bungle" -> -16,
    "complicate" -> -12, "condemn" -> -20, "confiscate" -> -15,
    "contaminate" -> -20, "crumble" -> -14, "decay" -> -16,
    "defame" -> -20, "deflate" -> -12, "defraud" -> -24, "demean" -> -18,
    "demote" -> -14, "denounce" -> -17, "deplete" -> -14,
    "deplore" -> -18, "deride" -> -17, "detest" -> -24, "devalue" -> -13,
    "discredit" -> -16, "dishonor" -> -20, "disparage" -> -18,
    "displease" -> -17, "distort" -> -14, "dwindle" -> -13,
    "embezzle" -> -24, "evict" -> -17, "exaggerate" -> -10,
    "exclude" -> -13, "expel" -> -16, "falter" -> -13, "flounder" -> -13,
    "forfeit" -> -15, "fumble" -> -12, "grieve" -> -21, "harass" -> -23,
    "hinder" -> -14, "impair" -> -15, "implode" -> -17, "imprison" -> -19,
    "incriminate" -> -17, "infect" -> -18, "inflame" -> -14,
    "invade" -> -18, "jeopardize" -> -18, "loathe" -> -25,
    "malfunction" -> -16, "mismanage" -> -16, "mistreat" -> -21,
    "obstruct" -> -14, "overcharge" -> -14, "overreact" -> -11,
    "penalize" -> -15, "perish" -> -22, "pester" -> -15,
    "plummet" -> -17, "plunder" -> -20, "provoke" -> -13,
    "ransack" -> -19, "ravage" -> -21, "rebuke" -> -15, "regress" -> -12,
    "reprimand" -> -14, "retaliate" -> -15, "scold" -> -14,
    "scorn" -> -18, "shatter" -> -17, "shun" -> -15, "slander" -> -21,
    "squabble" -> -12, "stagnate" -> -13, "stumble" -> -11,
    "suffocate" -> -22, "terrorize" -> -27, "torment" -> -23,
    "trespass" -> -13, "underperform" -> -14, "vandalize" -> -20,
    "violate" -> -19, "wail" -> -15, "weaken" -> -13, "whine" -> -13,
    "worsen" -> -16, "abduct" -> -23, "abhor" -> -25, "agitate" -> -13,
    "annihilate" -> -25, "backfire" -> -15, "banish" -> -16,
    "blackmail" -> -23, "capsize" -> -15, "censor" -> -13,
    "choke" -> -16, "clash" -> -13, "concede" -> -9, "cringe" -> -14,
    "cripple" -> -19, "crush" -> -14, "deceive" -> -23, "decompose" -> -12,
    "deflect" -> -8, "demonize" -> -18, "derail" -> -15,
    "desert" -> -15, "despoil" -> -18, "disable" -> -13, "disown" -> -16,
    "distrust" -> -17, "dread" -> -22, "flail" -> -11, "flop" -> -15,
    "frighten" -> -20, "frustrate" -> -21, "grumble" -> -12,
    "heckle" -> -14, "hijack" -> -22, "hoard" -> -12, "infest" -> -17,
    "infringe" -> -13, "injure" -> -19, "instigate" -> -12,
    "interrogate" -> -11, "intrude" -> -13, "lynch" -> -28,
    "mangle" -> -18, "menace" -> -20, "misfire" -> -13,
    "mourn" -> -21, "nag" -> -13, "obliterate" -> -22,
    "overwork" -> -13, "paralyze" -> -19, "persecute" -> -22,
    "pilfer" -> -16, "pressurize" -> -10, "punish" -> -23,
    "quarrel" -> -13, "ridicule" -> -19, "rust" -> -9, "scavenge" -> -9,
    "smuggle" -> -15, "snub" -> -14, "spoil" -> -15, "stain" -> -12,
    "stall" -> -10, "stifle" -> -13, "strangle" -> -24, "swindle" -> -22,
    "tease" -> -10, "threaten" -> -21, "traumatize" -> -24,
    "tremble" -> -13, "unsettle" -> -12, "uproot" -> -11, "vex" -> -15,
    "victimize" -> -20, "wither" -> -13, "wreck" -> -19)

  /** Adjectives (decivalence) whose -ly adverb is well-formed; each
    * contributes the adjective and the adverb.
    */
  private[graft] val AdjStems: Seq[(String, Int)] = Seq(
    // positive
    "abundant" -> 14, "admirable" -> 20, "affectionate" -> 20,
    "agile" -> 11, "ambitious" -> 13, "ample" -> 11, "artful" -> 11,
    "astute" -> 13, "blissful" -> 26, "bountiful" -> 17, "breezy" -> 10,
    "calm" -> 13, "candid" -> 11, "cheery" -> 21, "cordial" -> 15,
    "crisp" -> 9, "dainty" -> 10, "diligent" -> 14, "divine" -> 22,
    "effortless" -> 15, "elated" -> 24, "eloquent" -> 15,
    "enjoyable" -> 20, "enviable" -> 12, "ethical" -> 15,
    "exuberant" -> 21, "fabled" -> 11, "fertile" -> 10, "fervent" -> 12,
    "flawless" -> 29, "fluent" -> 12, "fragrant" -> 13, "generous" -> 23,
    "glamorous" -> 18, "gleeful" -> 22, "graceful" -> 19,
    "harmonious" -> 18, "hearty" -> 14, "honorable" -> 19,
    "hospitable" -> 16, "humane" -> 16, "immaculate" -> 20,
    "impeccable" -> 21, "ingenious" -> 19, "jovial" -> 20,
    "jubilant" -> 27, "judicious" -> 12, "lavish" -> 13, "lucid" -> 10,
    "luminous" -> 14, "lush" -> 12, "majestic" -> 21, "masterful" -> 18,
    "mellow" -> 11, "meritorious" -> 16, "mindful" -> 12,
    "miraculous" -> 24, "nimble" -> 11, "nifty" -> 14, "opulent" -> 14,
    "ornate" -> 10, "picturesque" -> 17,
    "plentiful" -> 14, "poetic" -> 11, "prompt" -> 10,
    "prudent" -> 11, "punctual" -> 11, "quaint" -> 10, "resolute" -> 13,
    "resourceful" -> 15, "reverent" -> 12, "savvy" -> 13, "seamless" -> 15,
    "selfless" -> 19, "sensible" -> 12, "serendipitous" -> 18,
    "skillful" -> 17, "spirited" -> 14, "spotless" -> 16,
    "steadfast" -> 14, "sturdy" -> 11, "suave" -> 12, "sublime" -> 23,
    "swift" -> 10, "tactful" -> 13, "thoughtful" -> 17, "thrifty" -> 10,
    "tranquil" -> 19, "trustworthy" -> 21, "unselfish" -> 16,
    "valiant" -> 18, "versatile" -> 13, "vigilant" -> 11,
    "virtuous" -> 18, "vivacious" -> 19, "warmhearted" -> 21,
    "whimsical" -> 12, "witty" -> 17, "zealous" -> 13,
    // negative
    "abrasive" -> -14, "abrupt" -> -9, "absurd" -> -14,
    "anemic" -> -11, "apprehensive" -> -13, "barbaric" -> -23,
    "belligerent" -> -18, "blatant" -> -12,
    "brash" -> -11, "brutish" -> -21, "callous" -> -18, "catty" -> -13,
    "clueless" -> -15, "coarse" -> -10, "combative" -> -13,
    "contemptuous" -> -18, "corrosive" -> -13, "crabby" -> -14,
    "cranky" -> -14, "crass" -> -13,
    "crooked" -> -17, "cumbersome" -> -12,
    "deceitful" -> -22, "deceptive" -> -18, "defiant" -> -11,
    "deplorable" -> -22, "desperate" -> -14,
    "despicable" -> -24, "detrimental" -> -16, "devious" -> -16,
    "dingy" -> -12, "disastrous" -> -26, "disloyal" -> -19,
    "dismissive" -> -12, "disrespectful" -> -20, "drab" -> -11,
    "dubious" -> -12, "egregious" -> -19, "erroneous" -> -13,
    "flagrant" -> -14, "flimsy" -> -12, "frail" -> -12,
    "frantic" -> -14, "fraudulent" -> -25, "frivolous" -> -10,
    "futile" -> -15, "ghastly" -> -22, "glum" -> -16, "grating" -> -12,
    "grotesque" -> -20, "grouchy" -> -14, "grudging" -> -11,
    "hapless" -> -13, "haughty" -> -13, "heartless" -> -22,
    "heinous" -> -26, "hollow" -> -9, "inept" -> -16, "infamous" -> -16,
    "insidious" -> -17, "insufferable" -> -19, "irate" -> -21,
    "irksome" -> -13, "joyless" -> -18, "lackluster" -> -13,
    "lousy" -> -18, "ludicrous" -> -14, "malignant" -> -21,
    "mediocre" -> -11, "merciless" -> -21, "moody" -> -11,
    "morbid" -> -16, "mundane" -> -8, "murky" -> -10, "needless" -> -11,
    "negligent" -> -17, "nefarious" -> -21,
    "odious" -> -21, "ominous" -> -16, "onerous" -> -12,
    "oppressive" -> -19, "perilous" -> -18, "pompous" -> -13,
    "precarious" -> -13, "pretentious" -> -13, "rancid" -> -18,
    "reckless" -> -19, "regrettable" -> -15, "repugnant" -> -22,
    "repulsive" -> -23, "resentful" -> -17, "ruinous" -> -19,
    "scandalous" -> -17, "senseless" -> -15, "shameful" -> -20,
    "shoddy" -> -16, "sour" -> -11, "spurious" -> -13, "squalid" -> -18,
    "stagnant" -> -12, "stern" -> -8, "tactless" -> -14, "tedious" -> -12,
    "treacherous" -> -21, "tyrannical" -> -22, "unbearable" -> -22,
    "uncouth" -> -13, "ungrateful" -> -17, "unkind" -> -17,
    "unscrupulous" -> -20,
    "vengeful" -> -18, "vulgar" -> -16, "wasteful" -> -14,
    "woeful" -> -18, "wretched" -> -22)

  /** Nouns (decivalence) with natural plurals; each contributes singular
    * and plural.
    */
  private[graft] val NounStems: Seq[(String, Int)] = Seq(
    // positive
    "accolade" -> 17, "ally" -> 13, "asset" -> 13, "award" -> 20,
    "bargain" -> 14, "blessing" -> 22, "bonanza" -> 19, "boon" -> 16,
    "breakthrough" -> 20, "celebration" -> 23, "compliment" -> 18,
    "darling" -> 19, "discovery" -> 14, "feast" -> 15, "festival" -> 15,
    "genius" -> 24, "hug" -> 18, "jewel" -> 16, "keepsake" -> 12,
    "kindness" -> 21, "luxury" -> 20, "medal" -> 16, "milestone" -> 13,
    "opportunity" -> 16, "ovation" -> 18, "paradise" -> 28,
    "perk" -> 13, "promotion" -> 16, "remedy" -> 13, "sanctuary" -> 14,
    "smile" -> 21, "solution" -> 12, "sweetheart" -> 22, "talent" -> 20,
    "treasure" -> 21, "trophy" -> 17, "upside" -> 12, "victory" -> 27,
    "virtue" -> 16, "windfall" -> 19, "wonder" -> 17,
    // negative
    "ailment" -> -15, "atrocity" -> -26, "backlash" -> -14,
    "bottleneck" -> -11, "calamity" -> -24, "casualty" -> -21,
    "collision" -> -14, "complication" -> -12, "controversy" -> -12,
    "culprit" -> -13, "deadlock" -> -12, "debacle" -> -19,
    "defect" -> -17, "deficiency" -> -14, "dilemma" -> -11,
    "downturn" -> -15, "drawback" -> -12, "epidemic" -> -20,
    "eyesore" -> -14, "famine" -> -23, "felony" -> -21, "feud" -> -14,
    "fiasco" -> -21, "glitch" -> -12, "grievance" -> -14,
    "hardship" -> -17, "hazard" -> -18, "hoax" -> -17, "hurdle" -> -10,
    "insurgent" -> -16, "lawsuit" -> -13, "liability" -> -13,
    "massacre" -> -29, "mishap" -> -13, "mistake" -> -17,
    "nuisance" -> -14, "obstacle" -> -11, "outbreak" -> -16,
    "pandemic" -> -20, "pitfall" -> -13, "quagmire" -> -14,
    "rascal" -> -10, "recession" -> -19, "rift" -> -11, "riot" -> -19,
    "setback" -> -14, "shortcoming" -> -12, "slump" -> -14,
    "stalemate" -> -10, "tyrant" -> -22, "upheaval" -> -14,
    "villain" -> -22)

  /** Round-9 adjective expansion (×2 via -ly) — general-register words
    * at VADER-like magnitudes, chosen so the -ly derivation is natural.
    */
  private[graft] val AdjStems2: Seq[(String, Int)] = Seq(
    "abysmal" -> -27, "accurate" -> 13, "adept" -> 14, "adequate" -> 6,
    "admirable" -> 20, "adorable" -> 22, "adverse" -> -14, "agreeable" -> 14,
    "aimless" -> -11, "amiable" -> 15, "ample" -> 10, "artful" -> 11,
    "atrocious" -> -28, "authentic" -> 13, "awkward" -> -11, "balanced" -> 9,
    "barbaric" -> -24, "bleak" -> -17, "blissful" -> 26, "boisterous" -> -5,
    "bold" -> 11, "brave" -> 18, "brisk" -> 8, "brutal" -> -23,
    "calm" -> 12, "candid" -> 10, "capable" -> 12, "careless" -> -14,
    "cautious" -> 4, "charitable" -> 16, "cheap" -> -7, "cheerful" -> 21,
    "chaotic" -> -15, "civil" -> 8, "clumsy" -> -11, "coherent" -> 9,
    "cold" -> -8, "comfortable" -> 14, "commendable" -> 18, "compassionate" -> 21,
    "competent" -> 12, "conclusive" -> 8, "confident" -> 15, "congenial" -> 14,
    "consistent" -> 9, "corrupt" -> -24, "courageous" -> 19, "courteous" -> 14,
    "cozy" -> 14, "crafty" -> -4, "cruel" -> -25,
    "crude" -> -12, "cunning" -> -5, "curious" -> 8, "decent" -> 11,
    "decisive" -> 10, "defective" -> -16, "deficient" -> -13, "deft" -> 12,
    "dependable" -> 14, "deplorable" -> -25, "desolate" -> -18, "desperate" -> -17,
    "destructive" -> -21, "devious" -> -15, "diligent" -> 13, "dire" -> -19,
    "dishonest" -> -21, "dismal" -> -19, "distasteful" -> -15,
    "dreadful" -> -24, "dreary" -> -13, "dubious" -> -11, "dutiful" -> 9,
    "eager" -> 13, "earnest" -> 11, "effective" -> 13, "efficient" -> 13,
    "elegant" -> 17, "eloquent" -> 14, "eminent" -> 13, "energetic" -> 13,
    "enjoyable" -> 18, "equitable" -> 11, "erratic" -> -12, "ethical" -> 13,
    "exact" -> 7, "exemplary" -> 20, "exquisite" -> 23, "faint" -> -5,
    "faithful" -> 15, "fearless" -> 15, "feeble" -> -13, "fertile" -> 9,
    "fierce" -> -7, "filthy" -> -19, "flawless" -> 24, "flimsy" -> -12,
    "fluent" -> 11, "fond" -> 13, "foolish" -> -14, "fortunate" -> 17,
    "foul" -> -20, "fragrant" -> 11, "frantic" -> -12, "fraudulent" -> -25,
    "fresh" -> 11, "frigid" -> -10, "frivolous" -> -9, "frugal" -> 6,
    "fruitful" -> 14, "futile" -> -15, "generous" -> 18, "gentle" -> 14,
    "genuine" -> 14, "glad" -> 17, "gloomy" -> -16, "graceful" -> 16,
    "gracious" -> 16, "grateful" -> 18, "grave" -> -13, "greedy" -> -17,
    "grim" -> -16, "gruesome" -> -22, "hapless" -> -12, "harmonious" -> 15,
    "harsh" -> -14, "hasty" -> -8, "hateful" -> -25, "healthy" -> 15,
    "heartless" -> -21, "heroic" -> 20, "hideous" -> -22, "honorable" -> 17,
    "hopeless" -> -21, "hostile" -> -19, "humane" -> 15, "humble" -> 10,
    "hysterical" -> -8, "ideal" -> 16, "idle" -> -8, "ignorant" -> -15,
    "immaculate" -> 19, "immense" -> 8, "impartial" -> 9, "impatient" -> -10,
    "impeccable" -> 21, "impolite" -> -13, "impressive" -> 18, "impulsive" -> -8,
    "inadequate" -> -14, "incompetent" -> -19, "inconsistent" -> -11,
    "indifferent" -> -8, "industrious" -> 12, "inept" -> -16, "inferior" -> -13,
    "ingenious" -> 17, "innocent" -> 10, "insolent" -> -15, "intelligent" -> 15,
    "intolerable" -> -19, "inventive" -> 13, "irate" -> -18,
    "joyous" -> 23, "judicious" -> 11, "keen" -> 11,
    "lame" -> -13, "lavish" -> 9, "lazy" -> -12, "lethal" -> -19,
    "loyal" -> 15, "lucid" -> 9,
    "ludicrous" -> -14, "luminous" -> 12, "magnificent" -> 24, "malicious" -> -23,
    "meager" -> -10, "meek" -> -5, "mellow" -> 9, "merciful" -> 14,
    "merciless" -> -21, "merry" -> 17, "mighty" -> 11, "miserable" -> -22,
    "modest" -> 8, "monstrous" -> -21, "morbid" -> -15, "mournful" -> -16,
    "naive" -> -8, "nasty" -> -19, "neat" -> 12, "negligent" -> -16,
    "nimble" -> 11, "noble" -> 15, "notorious" -> -13, "obnoxious" -> -18,
    "obscene" -> -19, "odious" -> -21, "ominous" -> -15,
    "oppressive" -> -18, "optimal" -> 14, "ornate" -> 8,
    "outrageous" -> -15, "overdue" -> -8, "painless" -> 9, "paltry" -> -10,
    "passionate" -> 14, "pathetic" -> -19, "peaceful" -> 18, "perilous" -> -16,
    "pessimistic" -> -13, "petty" -> -11, "placid" -> 8, "playful" -> 13,
    "pleasant" -> 17, "plentiful" -> 12, "polite" -> 13, "pompous" -> -12,
    "potent" -> 9, "praiseworthy" -> 18, "precarious" -> -13, "precise" -> 10,
    "prejudiced" -> -16, "pristine" -> 17, "productive" -> 13, "proficient" -> 13,
    "prosperous" -> 18, "proud" -> 13, "prudent" -> 10, "punctual" -> 9,
    "quaint" -> 8, "radiant" -> 18, "rancid" -> -17,
    "rash" -> -10, "reckless" -> -16, "refined" -> 12, "reliable" -> 14,
    "reluctant" -> -7, "repugnant" -> -21, "repulsive" -> -22, "resilient" -> 14,
    "resourceful" -> 14, "respectful" -> 14, "restless" -> -9, "rigorous" -> 8,
    "robust" -> 12, "rotten" -> -19, "rough" -> -9, "rude" -> -17,
    "ruthless" -> -19, "sane" -> 7, "savvy" -> 12,
    "scornful" -> -15, "seamless" -> 14, "secure" -> 12, "selfish" -> -16,
    "selfless" -> 16, "senseless" -> -15, "serene" -> 16, "shabby" -> -13,
    "shallow" -> -9, "shameful" -> -19, "shameless" -> -14, "shoddy" -> -16,
    "shrewd" -> 9, "skillful" -> 14, "sloppy" -> -13, "sluggish" -> -11,
    "smug" -> -10, "solemn" -> -4, "solid" -> 10, "sordid" -> -17,
    "sound" -> 9, "spacious" -> 10, "spiteful" -> -18, "splendid" -> 22,
    "spotless" -> 14, "stale" -> -10, "steadfast" -> 13,
    "sterile" -> -6, "stern" -> -7, "stingy" -> -13, "stout" -> 5,
    "strenuous" -> -6, "stubborn" -> -10, "stunning" -> 22, "sturdy" -> 10,
    "stylish" -> 13, "suave" -> 10, "subpar" -> -13, "subtle" -> 5,
    "sufficient" -> 7, "suitable" -> 8, "sullen" -> -12, "superb" -> 23,
    "superficial" -> -10, "supreme" -> 15, "swift" -> 9, "tactful" -> 11,
    "tactless" -> -13, "tasteful" -> 12, "tedious" -> -12, "tender" -> 12,
    "terrific" -> 22, "thankful" -> 17, "thorough" -> 10, "thoughtful" -> 15,
    "thoughtless" -> -14, "thrifty" -> 7, "tidy" -> 10, "timid" -> -8,
    "tiresome" -> -12, "tranquil" -> 15, "treacherous" -> -20, "trustworthy" -> 16,
    "truthful" -> 14, "unbearable" -> -20, "uncouth" -> -13, "unfit" -> -12,
    "ungrateful" -> -15, "unhealthy" -> -13, "unjust" -> -17, "unkind" -> -14,
    "unlucky" -> -13, "unpleasant" -> -15, "unreliable" -> -14, "unsafe" -> -15,
    "unsound" -> -11, "unstable" -> -13, "untidy" -> -9, "unwise" -> -11,
    "upbeat" -> 16, "useless" -> -17, "valiant" -> 16, "vibrant" -> 15,
    "vicious" -> -22, "vigilant" -> 9, "vigorous" -> 10, "vile" -> -23,
    "virtuous" -> 15, "vivid" -> 10, "vulgar" -> -16, "warm" -> 12,
    "wasteful" -> -13, "weary" -> -11, "wholesome" -> 15, "wicked" -> -19,
    "wise" -> 14, "wistful" -> -5, "witty" -> 14, "worthless" -> -19,
    "worthy" -> 13, "wretched" -> -21, "zealous" -> 8)

  /** Round-9 regular-verb expansion (×4 via -s/-ed/-ing) — only verbs
    * whose inflections the spelling rules produce correctly (irregulars
    * go to [[ExtraWords]] as explicit forms).
    */
  private[graft] val VerbStems2: Seq[(String, Int)] = Seq(
    "abandon" -> -16, "abolish" -> -8, "absolve" -> 10, "abuse" -> -24,
    "accomplish" -> 16, "accuse" -> -14, "ache" -> -13, "achieve" -> 16,
    "admire" -> 17, "adore" -> 22, "agonize" -> -18, "alienate" -> -14,
    "amaze" -> 20, "amuse" -> 14, "anger" -> -18, "annihilate" -> -22,
    "annoy" -> -14, "appall" -> -18, "applaud" -> 16, "appreciate" -> 15,
    "assault" -> -22, "assure" -> 10, "astonish" -> 17, "attack" -> -17,
    "avenge" -> -11, "banish" -> -12, "befriend" -> 13, "belittle" -> -15,
    "betray" -> -23, "bicker" -> -11, "blame" -> -14, "bless" -> 17,
    "blunder" -> -13, "boast" -> -8, "bolster" -> 11, "bore" -> -10,
    "bother" -> -10, "bungle" -> -13, "burden" -> -12, "calm" -> 11,
    "captivate" -> 16, "care" -> 11, "celebrate" -> 18, "censure" -> -12,
    "cherish" -> 19, "collapse" -> -16, "comfort" -> 14, "commend" -> 14,
    "complain" -> -12, "compliment" -> 14, "condemn" -> -17, "confuse" -> -11,
    "congratulate" -> 16, "conquer" -> 11, "console" -> 11, "contaminate" -> -16,
    "cooperate" -> 11, "corrode" -> -11, "cripple" -> -17, "criticize" -> -12,
    "crumble" -> -12, "crush" -> -15, "damage" -> -16, "dazzle" -> 16,
    "deceive" -> -20, "dedicate" -> 10, "defame" -> -16, "defend" -> 8,
    "degrade" -> -16, "delight" -> 20, "demolish" -> -13, "demoralize" -> -17,
    "denounce" -> -14, "deprive" -> -14, "desecrate" -> -17, "deserve" -> 8,
    "despair" -> -19, "despise" -> -21, "deteriorate" -> -15, "devastate" -> -23,
    "disappoint" -> -17, "discourage" -> -13, "disgrace" -> -18, "dishearten" -> -15,
    "dismay" -> -14, "disparage" -> -14, "displease" -> -13, "disrespect" -> -16,
    "disrupt" -> -12, "distort" -> -12, "distress" -> -16, "disturb" -> -12,
    "dominate" -> -6, "doubt" -> -9, "dread" -> -17, "embarrass" -> -14,
    "embrace" -> 13, "empower" -> 15, "enchant" -> 16, "encourage" -> 15,
    "endanger" -> -15, "endear" -> 12, "endure" -> 5, "enlighten" -> 13,
    "enrage" -> -19, "enrich" -> 14, "entertain" -> 12, "envy" -> -12,
    "exaggerate" -> -8, "exasperate" -> -14, "excite" -> 15, "exclude" -> -10,
    "exhaust" -> -12, "exploit" -> -16, "falter" -> -10, "fascinate" -> 15,
    "fatigue" -> -10, "flatter" -> 7, "flounder" -> -11, "flourish" -> 17,
    "frighten" -> -16, "frustrate" -> -16, "fulfill" -> 14,
    "fumble" -> -10, "glorify" -> 12, "gratify" -> 13, "grieve" -> -18,
    "harass" -> -20, "harm" -> -17, "heal" -> 15, "help" -> 14,
    "hinder" -> -11, "honor" -> 15, "humiliate" -> -20,
    "idolize" -> 13, "impair" -> -12, "impress" -> 14, "improve" -> 13,
    "infect" -> -13, "infuriate" -> -19, "injure" -> -16, "insult" -> -18,
    "intimidate" -> -15, "invigorate" -> 14, "irritate" -> -14, "jeopardize" -> -16,
    "languish" -> -13, "lament" -> -14, "liberate" -> 13, "loathe" -> -21,
    "lure" -> -7, "malign" -> -15, "manipulate" -> -14, "menace" -> -16,
    "mend" -> 10, "mistreat" -> -18, "mock" -> -15, "motivate" -> 13,
    "mourn" -> -17, "nurture" -> 14, "offend" -> -15, "oppress" -> -18,
    "overwhelm" -> -10, "pamper" -> 10, "paralyze" -> -15,
    "perish" -> -17, "persevere" -> 12, "pester" -> -12, "plague" -> -16,
    "please" -> 14, "poison" -> -19, "polish" -> 8, "pollute" -> -16,
    "praise" -> 17, "prosper" -> 16, "protect" -> 12, "provoke" -> -11,
    "punish" -> -14, "rattle" -> -8, "ravage" -> -19, "reassure" -> 12,
    "rebuke" -> -12, "reconcile" -> 11, "redeem" -> 12, "refresh" -> 12,
    "regret" -> -14, "rejoice" -> 19, "rejuvenate" -> 14, "relax" -> 12,
    "relieve" -> 12, "repair" -> 9, "rescue" -> 15, "resent" -> -15,
    "restore" -> 10, "revere" -> 14, "revitalize" -> 13, "ridicule" -> -16,
    "ruin" -> -19, "sabotage" -> -19, "sadden" -> -16, "satisfy" -> 14,
    "scare" -> -14, "scold" -> -12, "smear" -> -13, "soothe" -> 13,
    "squander" -> -14, "stagnate" -> -11, "starve" -> -18, "stifle" -> -11,
    "strangle" -> -19, "strengthen" -> 12, "struggle" -> -12, "stumble" -> -10,
    "suffer" -> -19, "suffocate" -> -17, "support" -> 12, "surrender" -> -9,
    "swindle" -> -19, "sympathize" -> 10, "tarnish" -> -13, "tease" -> -8,
    "terrify" -> -21, "terrorize" -> -23, "thank" -> 14, "threaten" -> -17,
    "thrive" -> 17, "torment" -> -20, "torture" -> -24, "trample" -> -13,
    "tremble" -> -11, "triumph" -> 18, "trust" -> 13, "unsettle" -> -11,
    "uplift" -> 17, "vandalize" -> -17, "vanquish" -> 10, "violate" -> -18,
    "welcome" -> 14, "wilt" -> -9, "worsen" -> -14, "worship" -> 12,
    "wound" -> -16, "wreck" -> -17)

  /** Round-9 noun expansion (×2 via plural). */
  private[graft] val NounStems2: Seq[(String, Int)] = Seq(
    "abundance" -> 12, "accolade" -> 15, "adversity" -> -13, "affection" -> 16,
    "agony" -> -22, "ally" -> 10, "ambition" -> 9, "anguish" -> -20,
    "apathy" -> -11, "atrocity" -> -25, "beauty" -> 17, "blessing" -> 17,
    "blunder" -> -13, "bravery" -> 16, "calamity" -> -20, "catastrophe" -> -23,
    "charm" -> 13, "comfort" -> 13, "compassion" -> 17, "confidence" -> 13,
    "conflict" -> -13, "courage" -> 16, "courtesy" -> 12,
    "cruelty" -> -22, "curse" -> -16, "danger" -> -15, "deceit" -> -18,
    "defeat" -> -14, "delight" -> 19, "despair" -> -20, "dignity" -> 13,
    "dilemma" -> -10, "disaster" -> -21, "disgust" -> -19, "distress" -> -16,
    "doom" -> -19, "ecstasy" -> 24, "elegance" -> 14, "empathy" -> 14,
    "enemy" -> -15, "enthusiasm" -> 15, "euphoria" -> 23, "failure" -> -18,
    "fatigue" -> -10, "felony" -> -18, "fiasco" -> -17, "fortune" -> 14,
    "fraud" -> -22, "friendship" -> 16, "generosity" -> 16, "glory" -> 17,
    "gratitude" -> 16, "grief" -> -19, "grievance" -> -12, "happiness" -> 21,
    "hardship" -> -14, "harmony" -> 15, "hatred" -> -24, "havoc" -> -16,
    "hazard" -> -13, "honesty" -> 14, "hostility" -> -17, "humiliation" -> -19,
    "injustice" -> -17, "insult" -> -16, "integrity" -> 14, "jeopardy" -> -14,
    "joy" -> 21, "kindness" -> 17, "laughter" -> 17, "liberty" -> 14,
    "loyalty" -> 14, "luxury" -> 13, "masterpiece" -> 21, "menace" -> -15,
    "mercy" -> 13, "miracle" -> 20, "mischief" -> -9, "misery" -> -21,
    "misfortune" -> -16, "mistake" -> -12, "nightmare" -> -21, "nuisance" -> -12,
    "optimism" -> 14, "ordeal" -> -14, "paradise" -> 22, "passion" -> 14,
    "peril" -> -15, "plague" -> -17, "pleasure" -> 17, "poverty" -> -17,
    "prosperity" -> 17, "rage" -> -19, "rebellion" -> -10, "relief" -> 13,
    "remorse" -> -13, "resentment" -> -15, "reward" -> 14, "riot" -> -15,
    "sabotage" -> -18, "sacrifice" -> -6, "scandal" -> -17, "serenity" -> 16,
    "shame" -> -17, "sincerity" -> 13, "slander" -> -16, "sorrow" -> -18,
    "strength" -> 12, "stress" -> -14, "success" -> 17, "sympathy" -> 12,
    "tenderness" -> 14, "terror" -> -22, "threat" -> -16, "tragedy" -> -21,
    "treason" -> -19, "trouble" -> -14, "turmoil" -> -16, "tyranny" -> -20,
    "valor" -> 15, "vengeance" -> -16, "victory" -> 18, "villain" -> -16,
    "violence" -> -21, "virtue" -> 13, "warmth" -> 14, "wisdom" -> 15,
    "wrath" -> -19, "zeal" -> 9)

  /** Finance / markets-forum vocabulary — the reference corpus is
    * r/wallstreetbets posts scored with VADER (stock_pipeline.py:139),
    * so ticker-chat slang carries most of the real signal there.
    */
  private[graft] val FinanceBatch: Seq[(String, Int)] = Seq(
    "bull" -> 13, "bullish" -> 19, "bulls" -> 13, "bear" -> -12,
    "bearish" -> -19, "bears" -> -12, "rally" -> 17, "rallies" -> 17,
    "rallied" -> 17, "moon" -> 22, "mooning" -> 23, "rocket" -> 19,
    "rockets" -> 19, "surge" -> 16, "surged" -> 17, "surging" -> 17,
    "soared" -> 18, "soaring" -> 18, "breakout" -> 14, "uptrend" -> 15,
    "downtrend" -> -15, "dip" -> -8, "dipped" -> -9, "selloff" -> -16,
    "sell-off" -> -16, "plunge" -> -18, "plunged" -> -19,
    "plunging" -> -19, "tank" -> -15, "tanked" -> -18, "tanking" -> -18,
    "crater" -> -16, "cratered" -> -18, "dump" -> -14, "dumped" -> -15,
    "dumping" -> -15, "bagholder" -> -17, "bagholders" -> -17,
    "rekt" -> -21, "margin-call" -> -19, "liquidated" -> -19,
    "liquidation" -> -17, "default" -> -16, "defaulted" -> -17,
    "insolvent" -> -21, "insolvency" -> -20, "bankruptcy" -> -24,
    "delisted" -> -18, "delisting" -> -17, "dilution" -> -13,
    "diluted" -> -12, "shorted" -> -8, "squeeze" -> 11, "gains" -> 19,
    "gainz" -> 20, "profits" -> 19, "profitable" -> 19, "dividend" -> 12,
    "dividends" -> 12, "undervalued" -> 13, "overvalued" -> -12,
    "outperform" -> 15, "outperformed" -> 16, "underperformed" -> -15,
    "beat" -> 11, "beats" -> 12, "missed" -> -13, "guidance-cut" -> -16,
    "upgrade" -> 14, "upgraded" -> 15, "downgrade" -> -15,
    "downgraded" -> -16, "bubble" -> -12, "correction" -> -11,
    "volatile" -> -10, "volatility" -> -9, "stonks" -> 15,
    "tendies" -> 20, "yolo" -> 8, "fomo" -> -9, "fud" -> -14,
    "hodl" -> 10, "diamondhands" -> 14, "paperhands" -> -12,
    "shill" -> -14, "shilling" -> -14, "pump" -> 8, "pumped" -> 10,
    "rugpull" -> -23, "rug-pull" -> -23, "scammy" -> -20,
    "ponzi" -> -24, "overbought" -> -9, "oversold" -> 7,
    "capitulation" -> -16, "capitulate" -> -14, "deleveraging" -> -10,
    "writedown" -> -14, "write-off" -> -13, "impairment" -> -13,
    "windfalls" -> 19, "blowout" -> 13, "stellar-quarter" -> 21,
    "record-high" -> 18, "all-time-high" -> 19, "ath" -> 16,
    "all-time-low" -> -18, "haircut" -> -12, "freefall" -> -20,
    "bloodbath" -> -22, "carnage" -> -21, "meltup" -> 12,
    "circuit-breaker" -> -15, "halted" -> -12, "frothy" -> -9,
    "resilience" -> 14, "headwind" -> -11, "headwinds" -> -12,
    "tailwind" -> 12, "tailwinds" -> 13, "beatdown" -> -15,
    "squeezed" -> 8, "margin" -> 0, "leveraged" -> -5, "solvency" -> 6)

  /** Slang + emoticon tokens (the \S+ tokenizer hands these over as-is;
    * lookups lowercase, so only lowercase keys).
    */
  private[graft] val SlangBatch: Seq[(String, Int)] = Seq(
    ":)" -> 20, ":-)" -> 20, ":))" -> 22, ":d" -> 23, ":-d" -> 23,
    ";)" -> 14, ";-)" -> 14, ":(" -> -19, ":-(" -> -19, ":((" -> -22,
    ":/" -> -11, ":-/" -> -11, ":|" -> -5, ":p" -> 12, ":-p" -> 12,
    "<3" -> 26, "</3" -> -24, "=)" -> 19, "=(" -> -18, "^_^" -> 21,
    "-_-" -> -11, "t_t" -> -18, "xd" -> 21, "xoxo" -> 22, "lol" -> 16,
    "lmao" -> 18, "rofl" -> 19, "haha" -> 17, "hahaha" -> 19,
    "hehe" -> 13, "yikes" -> -13, "ugh" -> -15, "meh" -> -7,
    "blah" -> -8, "wtf" -> -17, "omg" -> 8, "smh" -> -12, "ffs" -> -17,
    "gg" -> 14, "ez" -> 9, "noob" -> -11, "pwned" -> -9, "epic-win" -> 24,
    "epic-fail" -> -22, "fail-whale" -> -15, "facepalm" -> -13,
    "derp" -> -9, "cringe" -> -14, "cringey" -> -15, "based" -> 12,
    "goat" -> 21, "lit" -> 16, "dope" -> 16, "sick" -> -22,
    "rad" -> 17, "stoked" -> 20, "psyched" -> 19, "hyped" -> 17,
    "salty" -> -12, "toxicity" -> -21, "troll" -> -14, "trolls" -> -14,
    "trolling" -> -15, "spammy" -> -14, "clickbait" -> -13,
    "garbage-tier" -> -19, "god-tier" -> 22, "banger" -> 18,
    "bop" -> 14, "slaps" -> 16, "vibes" -> 12, "vibing" -> 14,
    "sus" -> -12, "yeet" -> 9, "bruh" -> -7, "oof" -> -12, "rip" -> -14,
    "pog" -> 18, "poggers" -> 19, "kek" -> 12, "copium" -> -11,
    "hopium" -> -6, "doomer" -> -14, "bloomer" -> 12, "chad" -> 13,
    "legend" -> 20, "dub" -> 13, "ratio" -> -9,
    "flex" -> 8, "simp" -> -9, "savage" -> -19, "slay" -> 15)

  // ---- morphological derivation (standard English spelling rules) ----

  /** Stems whose final consonant doubles before -ed/-ing. */
  private val DoubleFinal =
    Set("expel", "excel", "nag", "snub", "stun", "flop", "shun", "abhor",
      "regret", "outwit", "mar", "skim", "propel")

  /** Words whose inflections are irregular or unnatural — entered as
    * explicit single forms instead of through the derivation rules.
    */
  private[graft] val ExtraWords: Seq[(String, Int)] = Seq(
    "bogus" -> -17, "obsolete" -> -10, "fickle" -> -10, "unruly" -> -12,
    "untimely" -> -11, "outgoing" -> 13, "poised" -> 12, "alarmed" -> -15,
    "cringeworthy" -> -16, "derelict" -> -14, "cutthroat" -> -15,
    "vermin" -> -17, "wreckage" -> -18, "misled" -> -20,
    "overpay" -> -11, "overpays" -> -11, "overpaid" -> -11,
    "overpaying" -> -11, "flung" -> -8, "forsaken" -> -17,
    "forsook" -> -16, "stole" -> -23, "overthrew" -> -14,
    "overthrown" -> -14, "outshone" -> 15, "uplifted" -> 20,
    "overcame" -> 17, "overcome" -> 14, "withstood" -> 12,
    "withstand" -> 10, "heartwarming" -> 24, "awestruck" -> 19,
    "spellbound" -> 17, "standout" -> 16, "standstill" -> -11,
    "shipwreck" -> -17, "downhearted" -> -18, "crestfallen" -> -18,
    "browbeaten" -> -16, "woebegone" -> -17,
    // r9: forms the derivation rules cannot produce (irregular verbs,
    // -ly-final adjectives whose adverb would be "-lily", Greek plurals)
    "forgive" -> 14, "forgives" -> 14, "forgave" -> 14, "forgiven" -> 14,
    "forgiving" -> 15, "hurt" -> -17, "hurts" -> -17, "hurting" -> -17,
    "panic" -> -16, "panics" -> -16, "panicked" -> -17, "panicking" -> -17,
    "crisis" -> -18, "crises" -> -18, "lonely" -> -15, "lively" -> 14,
    "stately" -> 10, "orderly" -> 9, "disorderly" -> -11,
    "cowardly" -> -15, "kindly" -> 14, "jolly" -> 17,
    // bare forms whose -ly adverb is a lookback MODIFIER ("purely" is an
    // intensifier, "scarcely" a negator) — a word cannot be both a hit
    // and the next word's modifier, so only the bare form enters
    "pure" -> 12, "scarce" -> -9)

  private def endsWithAny(w: String, ss: String*): Boolean = ss.exists(w.endsWith)
  private def consY(w: String): Boolean =
    w.length > 1 && w.endsWith("y") && !"aeiou".contains(w.charAt(w.length - 2))

  /** 3rd-person-s / plural: -es after sibilants, -ies after consonant+y. */
  private[graft] def sForm(w: String): String =
    if (consY(w)) w.dropRight(1) + "ies"
    else if (endsWithAny(w, "s", "x", "z", "ch", "sh")) w + "es"
    else w + "s"

  private def doubled(w: String): String = w + w.last

  private[graft] def pastForm(w: String): String =
    if (w.endsWith("e")) w + "d"
    else if (consY(w)) w.dropRight(1) + "ied"
    else if (DoubleFinal(w)) doubled(w) + "ed"
    else w + "ed"

  private[graft] def ingForm(w: String): String =
    if (w.endsWith("ee")) w + "ing"
    else if (w.endsWith("e")) w.dropRight(1) + "ing"
    else if (DoubleFinal(w)) doubled(w) + "ing"
    else w + "ing"

  private[graft] def lyForm(w: String): String =
    if (consY(w)) w.dropRight(1) + "ily"
    else if (w.endsWith("ic")) w + "ally"
    else if (w.endsWith("le") && w.length > 2 && !"aeiou".contains(w.charAt(w.length - 3)))
      w.dropRight(1) + "y"
    else if (w.endsWith("ll")) w + "y"
    else if (w.endsWith("ue")) w.dropRight(1) + "ly"
    else w + "ly"

  private def derivedEntries: Seq[(String, Int)] = {
    import SentimentLexGrowth.{VerbStems3, VerbStems4, VerbStems5,
      VerbStems6, AdjStems3, AdjStems4, AdjStems5, AdjStems6, NounStems3,
      NounStems4, NounStems5, NounStems6, ExtraWords2, ExtraWords3,
      ExtraWords4, ExtraWords5}
    (VerbStems ++ VerbStems2 ++ VerbStems3 ++ VerbStems4 ++ VerbStems5 ++
      VerbStems6)
      .flatMap { case (w, v) =>
        Seq(w -> v, sForm(w) -> v, pastForm(w) -> v, ingForm(w) -> v) } ++
    (AdjStems ++ AdjStems2 ++ AdjStems3 ++ AdjStems4 ++ AdjStems5 ++
      AdjStems6)
      .flatMap { case (w, v) => Seq(w -> v, lyForm(w) -> v) } ++
    (NounStems ++ NounStems2 ++ NounStems3 ++ NounStems4 ++ NounStems5 ++
      NounStems6)
      .flatMap { case (w, v) => Seq(w -> v, sForm(w) -> v) } ++
    ExtraWords ++ ExtraWords2 ++ ExtraWords3 ++ ExtraWords4 ++
    ExtraWords5 ++ FinanceBatch ++ SlangBatch
  }

  /** word → integer decivalence (VADER-like valence × 10): the curated
    * core merged with the derived/domain batches. First occurrence wins
    * (curated precedence), so the list is duplicate-free by construction
    * and both engines' lookups agree.
    */
  val Lexicon: Seq[(String, Int)] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    (Curated ++ derivedEntries).foreach { case (w, v) =>
      if (!seen.contains(w)) seen(w) = v
    }
    seen.toSeq
  }

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

  /** Trailing characters stripped from a token to find its lexicon CORE;
    * `!` among them is also the emphasis-amplifier character.
    */
  val EmphasisPunct: String = "!?.,;:"

  private val alpha = 15.0
  // 1e-5-valence scale factors: base ×10000 over decivalence (= ×100000
  // over valence); negation −0.74 (exact on base/100); booster 0.293;
  // ALL-CAPS emphasis 0.733; per-`!` amplifier 0.292 capped at 3 bangs
  private val NegScalar = -74L
  private val Boost = 29300L
  private val CapsBoost = 73300L
  private val BangAmp = 29200L
  private val MaxBangs = 3L

  /** Decivalence of a lowercased core token — one literal-map lookup.
    *
    * r14: this was a flat ~2900-branch CASE. Interpreted `CaseWhen.eval`
    * indexes its branch List per probe — O(branches²) per call — and the
    * only consumer ([[rawScoreDeclarative]], the HOF equivalence
    * reference, always interpreted) evaluated it per token per doc: the
    * r13 driver test run died in a 29-CPU-minute task inside exactly
    * this expression (thread dump: CaseWhen.eval → List.apply under
    * ArrayTransform/ZipWith). A map literal probes in one pass and keeps
    * the lexicon in the plan as ONE literal. Semantics identical: keys
    * are distinct (spec-pinned), absent → 0.
    */
  private val LexiconMap: Column =
    typedlit(Lexicon.map { case (w, v) => w -> v.toLong }.toMap)
  private def valence(w: Column): Column =
    coalesce(element_at(LexiconMap, w), lit(0L))

  /** Integer raw score in 1e-5 valence units: context-aware sum over the
    * token stream with VADER's emphasis mechanics, as the codegen'd
    * [[SentimentScoreExpr]] (the declarative higher-order form below is
    * kept as the semantic reference — HOF lambdas evaluate interpreted,
    * which makes the big lexicon CASE the hottest loop in the engine; the
    * native expression is a one-pass hash-lookup loop inside whole-stage
    * codegen).
    */
  def rawScore(tokens: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SentimentScoreExpr(org.apache.spark.sql.graft.bridge.expression(tokens)))

  /** The declarative HOF twin of [[rawScore]] — semantics documentation
    * and equivalence-test target, not the production path. Stage for
    * stage it mirrors [[SentimentScore.score]]: cores/caps/bang/but
    * census first, then the per-token emphasis-and-context stack, then
    * the sign-aware bang amplifier.
    */
  private[graft] def rawScoreDeclarative(tokens: Column): Column = {
    val cores = transform(tokens,
      w => lower(regexp_replace(w, s"[$EmphasisPunct]+$$", "")))
    val capsFlags = transform(tokens, w => {
      val core = regexp_replace(w, s"[$EmphasisPunct]+$$", "")
      (core === upper(core) && core =!= lower(core)).cast("long")
    })
    val nCaps = aggregate(capsFlags, lit(0L), (a, x) => a + x)
    val capsDiff = nCaps > 0 && nCaps < size(tokens)
    val butIdx = array_position(cores, "but") // 1-based; 0 = absent
    val nExcl = aggregate(
      transform(tokens, w =>
        (length(w) - length(regexp_replace(w, "!", ""))).cast("long")),
      lit(0L), (a, x) => a + x)
    // the ~2900-branch valence CASE must appear in the plan exactly ONCE
    // (as the transform input below); every later reference to the hit's
    // strength is the `base` LAMBDA VARIABLE, never a re-expansion — the
    // naive nesting blows the plan string up combinatorially. The caps
    // add keeps sign(base) == sign(d) and base == 0 ⟺ d == 0, so base
    // alone drives every sign test.
    val bases = zip_with(transform(cores, c => valence(c)), capsFlags,
      (d, cf) => d * 10000L +
        when(capsDiff && cf === 1L,
          when(d > 0, lit(CapsBoost)).otherwise(-lit(CapsBoost)))
          .otherwise(lit(0L)))
    val terms = transform(bases, (base, i0) => {
      val i = i0 + lit(1) // 1-based position, as the oracle comprehension
      val prev = element_at(cores, when(i > 1, i - 1).otherwise(lit(1))) // guarded below
      // Column `/` is double division; base is a multiple of 100 and ctx
      // is even, so the casts back to long are exact
      val ctx = when(i === 1, base)
        .when(prev.isin(Negations: _*),
          lit(NegScalar) * (base / 100L).cast("long"))
        .when(prev.isin(Intensifiers: _*),
          when(base > 0, base + Boost).otherwise(base - Boost))
        .when(prev.isin(Dampeners: _*),
          when(base > 0, greatest(lit(0L), base - Boost))
            .otherwise(least(lit(0L), base + Boost)))
        .otherwise(base)
      val weighted = when(butIdx === 0, ctx)
        .when(i < butIdx, (ctx / 2L).cast("long"))
        .when(i > butIdx, (lit(3L) * ctx / 2L).cast("long"))
        .otherwise(ctx)
      when(base === 0, lit(0L)).otherwise(weighted)
    })
    val s = aggregate(terms, lit(0L), (a, x) => a + x)
    val amp = least(nExcl, lit(MaxBangs)) * BangAmp
    when(s > 0, s + amp).when(s < 0, s - amp).otherwise(s)
  }

  /** VADER compound normalization of the 1e-5-scale raw score:
    * r / sqrt(r² + 15) over the unscaled sum, in (−1, 1). Pure double
    * arithmetic over an exact integer — portable.
    */
  def compound(raw: Column): Column = {
    val r = raw.cast("double") / lit(100000.0)
    r / sqrt(r * r + lit(alpha))
  }

  // ---- DuckDB-side equivalents (same tables, same arithmetic) ----

  /** Lowercased-core array (trailing emphasis punctuation stripped) for a
    * token-array expression — the lookup/lookback surface.
    */
  def coresArraySql(toksCol: String): String =
    s"list_transform($toksCol, w -> lower(regexp_replace(w, '[$EmphasisPunct]+$$', '')))"

  /** Decivalence array for a CORES-array expression — inline this ONCE
    * (the ~290-branch CASE is large); downstream score SQL references the
    * resulting column by name.
    */
  def valenceArraySql(coresCol: String): String = {
    val cases = Lexicon.map { case (k, v) =>
      s"WHEN '$k' THEN CAST($v AS BIGINT)" }.mkString(" ")
    s"list_transform($coresCol, w -> CASE w $cases ELSE CAST(0 AS BIGINT) END)"
  }

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** ALL-CAPS flag array (1/0 per token) for a token-array expression. */
  def capsFlagsArraySql(toksCol: String): String = {
    val core = s"regexp_replace(w, '[$EmphasisPunct]+$$', '')"
    s"list_transform($toksCol, w -> CASE WHEN $core = upper($core) " +
      s"AND $core <> lower($core) THEN 1 ELSE 0 END)"
  }

  /** Mixed-case test from the caps-flag array (VADER allcap differential). */
  def capsDiffSql(cfCol: String, toksCol: String): String =
    s"(coalesce(list_sum($cfCol), 0) > 0 AND " +
      s"coalesce(list_sum($cfCol), 0) < len($toksCol))"

  /** 1-based index of the first contrastive `but` core; 0 = absent. */
  def butIdxSql(csCol: String): String =
    s"coalesce(list_position($csCol, 'but'), 0)"

  /** Count of `!` characters across the tokens (== across the text). */
  def nExclSql(toksCol: String): String =
    s"coalesce(list_sum(list_transform($toksCol, " +
      s"w -> len(w) - len(replace(w, '!', '')))), 0)"

  /** UNAMPLIFIED 1e-5-valence sum from per-doc census columns: `csCol`
    * (cores), `dsCol` (decivalences), `cfCol` (caps flags), `cdCol`
    * (caps-diff bool), `biCol` (but index). Mirrors [[rawScore]]'s
    * per-token emphasis-and-context stack; apply [[ampRawSql]] one level
    * up for the bang amplifier.
    */
  def rawBaseSql(csCol: String, dsCol: String, cfCol: String,
      cdCol: String, biCol: String): String = {
    val base = s"($dsCol[i] * 10000 + CASE WHEN $cdCol AND $cfCol[i] = 1 " +
      s"THEN CASE WHEN $dsCol[i] > 0 THEN $CapsBoost ELSE -$CapsBoost END " +
      s"ELSE 0 END)"
    val ctx = s"""CASE
             WHEN $csCol[i-1] IN (${inList(Negations)})
               THEN $NegScalar * ($base // 100)
             WHEN $csCol[i-1] IN (${inList(Intensifiers)})
               THEN CASE WHEN $dsCol[i] > 0 THEN $base + $Boost
                         ELSE $base - $Boost END
             WHEN $csCol[i-1] IN (${inList(Dampeners)})
               THEN CASE WHEN $dsCol[i] > 0
                         THEN greatest(CAST(0 AS BIGINT), $base - $Boost)
                         ELSE least(CAST(0 AS BIGINT), $base + $Boost) END
             ELSE $base END"""
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       [CASE WHEN $dsCol[i] = 0 THEN CAST(0 AS BIGINT)
             WHEN $biCol = 0 THEN $ctx
             WHEN i < $biCol THEN ($ctx) // 2
             WHEN i > $biCol THEN (3 * ($ctx)) // 2
             ELSE $ctx END
        for i in range(1, len($csCol) + 1)]), (a, b) -> a + b)"""
  }

  /** Sign-aware exclamation amplifier over a pre-computed raw-base column
    * and bang-count column — the final raw score.
    */
  def ampRawSql(raw0Col: String, neCol: String): String =
    s"""CAST(CASE WHEN $raw0Col > 0
              THEN $raw0Col + least($neCol, $MaxBangs) * $BangAmp
              WHEN $raw0Col < 0
              THEN $raw0Col - least($neCol, $MaxBangs) * $BangAmp
              ELSE $raw0Col END AS BIGINT)"""

  def compoundSql(rawExpr: String): String =
    s"(CAST($rawExpr AS DOUBLE) / 100000.0) / " +
      s"sqrt((CAST($rawExpr AS DOUBLE) / 100000.0) * (CAST($rawExpr AS DOUBLE) / 100000.0) + $alpha)"
}
