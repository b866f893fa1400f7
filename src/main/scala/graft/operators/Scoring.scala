package graft.operators

import graft.{QueryDef, QueryModule}
import graft.functions.{Portable, SentimentLex}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sentiment + model-scoring pipeline (SURVEY.md §2.9 X2/X3, §2.4 A5,
  * §2.11 M4/M5): the reference's VADER-scored, XGBoost-scored prediction
  * flow re-expressed as fully-distributed declarative plans.
  *
  * The reference's scoring path is the worst anti-pattern in the codebase
  * (SURVEY.md §4 "known anti-patterns"): collect() of dates, a driver-side
  * per-day loop, toPandas, a per-row model call and a per-row MongoClient
  * (stock_pipeline.py:145-291). Here scoring is a deterministic expression
  * over a feature struct — at 100 TB it is per-row map work inside
  * whole-stage codegen, with model weights inlined as literals (the real
  *-model analog broadcasts weight arrays; shape identical).
  */
object Scoring extends QueryModule {

  // ---------------------------------------------------------------------
  // q31 — sentiment scoring (X2/F7): per-doc integer lexicon score +
  // VADER-style compound normalization, as a native expression chain.
  // ---------------------------------------------------------------------
  private val q31 = QueryDef(
    "q31_sentiment_score",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("raw", SentimentLex.rawScore(Portable.tokens($"text")))
        .withColumn("compound", SentimentLex.compound($"raw"))
        .select($"doc_id", $"lang", $"raw", $"compound")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, lang, raw, ${SentimentLex.compoundSql("raw")} AS compound
      FROM (
        SELECT doc_id, lang,
               ${SentimentLex.ampRawSql("raw0", "ne")} AS raw
        FROM (
          SELECT doc_id, lang,
                 ${SentimentLex.rawBaseSql("cs", "ds", "cf", "cd", "bi")} AS raw0,
                 ${SentimentLex.nExclSql("toks")} AS ne
          FROM (
            SELECT doc_id, lang, toks, cs, cf,
                   ${SentimentLex.valenceArraySql("cs")} AS ds,
                   ${SentimentLex.capsDiffSql("cf", "toks")} AS cd,
                   ${SentimentLex.butIdxSql("cs")} AS bi
            FROM (
              SELECT doc_id, lang, toks,
                     ${SentimentLex.coresArraySql("toks")} AS cs,
                     ${SentimentLex.capsFlagsArraySql("toks")} AS cf
              FROM (SELECT doc_id, lang,
                           ${Portable.tokensSql("text")} AS toks
                    FROM documents)))))
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------------
  // q32 — sentiment distribution aggs (A5: mean, std, pos/neg ratios —
  // stock_pipeline.py:189-200, Untitled1 · cell 7) per language. Raw
  // scores are exact integers so mean/std/ratios are exact-arithmetic
  // (int sums, one double division at the end) — partition-order
  // invariant and engine-portable.
  // ---------------------------------------------------------------------
  private val q32 = QueryDef(
    "q32_sentiment_stats",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("raw", SentimentLex.rawScore(Portable.tokens($"text")))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n"),
          sum($"raw").as("s1"),
          // squares sum in decimal: raw² is up to ~1e16 at the 1e-5 scale,
          // so a Long sum overflows within ~1k rows; DuckDB sums HUGEINT
          sum($"raw".cast("decimal(19,0)") * $"raw".cast("decimal(19,0)"))
            .as("s2"),
          sum(($"raw" > 0).cast("long")).as("n_pos"),
          sum(($"raw" < 0).cast("long")).as("n_neg"))
        .select(
          $"lang", $"n",
          ($"s1".cast("double") / $"n".cast("double")).as("mean_raw"),
          sqrt(($"s2".cast("double") - $"s1".cast("double") * $"s1".cast("double")
            / $"n".cast("double")) / ($"n".cast("double") - 1)).as("std_raw"),
          ($"n_pos".cast("double") / $"n".cast("double")).as("pos_ratio"),
          ($"n_neg".cast("double") / $"n".cast("double")).as("neg_ratio"))
        .orderBy($"lang")
    },
    Some(s"""
      SELECT lang, n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_raw,
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS std_raw,
             CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_ratio,
             CAST(n_neg AS DOUBLE) / CAST(n AS DOUBLE) AS neg_ratio
      FROM (
        SELECT lang, count(*) AS n, sum(raw) AS s1, sum(raw * raw) AS s2,
               sum(CAST(raw > 0 AS BIGINT)) AS n_pos,
               sum(CAST(raw < 0 AS BIGINT)) AS n_neg
        FROM (
          SELECT lang, ${SentimentLex.ampRawSql("raw0", "ne")} AS raw
          FROM (
            SELECT lang,
                   ${SentimentLex.rawBaseSql("cs", "ds", "cf", "cd", "bi")} AS raw0,
                   ${SentimentLex.nExclSql("toks")} AS ne
            FROM (
              SELECT lang, toks, cs, cf,
                     ${SentimentLex.valenceArraySql("cs")} AS ds,
                     ${SentimentLex.capsDiffSql("cf", "toks")} AS cd,
                     ${SentimentLex.butIdxSql("cs")} AS bi
              FROM (
                SELECT lang, toks,
                       ${SentimentLex.coresArraySql("toks")} AS cs,
                       ${SentimentLex.capsFlagsArraySql("toks")} AS cf
                FROM (SELECT lang, ${Portable.tokensSql("text")} AS toks
                      FROM documents)))))
        GROUP BY lang)
      ORDER BY lang"""))

  // ---------------------------------------------------------------------
  // q33 — prediction-doc pipeline (X3 scoring + M4 feature assembly + M5
  // doc materialization + F3 confidence): per (ticker, date) bar, assemble
  // lag features, score a deterministic linear surrogate model (the
  // XGBoost stand-in; weights inlined), compare against the next-day
  // actual, and emit the prediction document with the reference's
  // deterministic confidence formula greatest(0.5, 1 − |err|/actual)
  // (05 · cell 8 — replacing the np.random confidence of
  // stock_pipeline.py:250, SURVEY.md §5).
  // ---------------------------------------------------------------------
  private val (w0, w1, w2) = (0.0001, -0.15, 0.05) // surrogate model weights
  private val q33 = QueryDef(
    "q33_prediction_docs",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy("ticker").orderBy("date")
      val prev = lag($"close", 1).over(w)
      WindowFeatures.bars(spark, dir)
        .withColumn("daily_return", ($"close" - prev) / prev)
        .withColumn("vol_signal", lit(1.0) / ($"volume".cast("double") + lit(1.0)))
        .withColumn("close_next", lead($"close", 1).over(w))
        .filter($"daily_return".isNotNull && $"close_next".isNotNull)
        .withColumn("pred_return",
          lit(w0) + lit(w1) * $"daily_return" + lit(w2) * $"vol_signal")
        .withColumn("predicted_price", $"close" * (lit(1.0) + $"pred_return"))
        .withColumn("prediction_error", $"predicted_price" - $"close_next")
        .withColumn("prediction_pct_error",
          abs($"prediction_error") / $"close_next" * lit(100.0))
        .withColumn("confidence",
          greatest(lit(0.5), lit(1.0) - abs($"prediction_error") / $"close_next"))
        .withColumn("model_type", lit("surrogate_linear"))
        .select($"ticker", $"date", $"close", $"daily_return", $"vol_signal",
          $"predicted_price", $"close_next".as("actual_price"),
          $"prediction_error", $"prediction_pct_error", $"confidence",
          $"model_type")
        .orderBy($"ticker", $"date")
    },
    Some(s"""
      WITH ${WindowFeatures.barsSql},
      feat AS (
        SELECT ticker, date, close, volume,
               (close - lag(close,1) OVER w) / lag(close,1) OVER w AS daily_return,
               1.0 / (CAST(volume AS DOUBLE) + 1.0) AS vol_signal,
               lead(close,1) OVER w AS close_next
        FROM bars WINDOW w AS (PARTITION BY ticker ORDER BY date)),
      scored AS (
        SELECT *, $w0 + $w1 * daily_return + $w2 * vol_signal AS pred_return
        FROM feat WHERE daily_return IS NOT NULL AND close_next IS NOT NULL)
      SELECT ticker, date, close, daily_return, vol_signal,
             close * (1.0 + pred_return) AS predicted_price,
             close_next AS actual_price,
             close * (1.0 + pred_return) - close_next AS prediction_error,
             abs(close * (1.0 + pred_return) - close_next) / close_next * 100.0
               AS prediction_pct_error,
             greatest(0.5, 1.0 - abs(close * (1.0 + pred_return) - close_next)
               / close_next) AS confidence,
             'surrogate_linear' AS model_type
      FROM scored ORDER BY ticker, date"""))

  // ---------------------------------------------------------------------
  // q102 — REAL artifact scoring (X3 completed): the same feature assembly
  // as q33, but the model is a serialized GBT ensemble DESERIALIZED FROM
  // BYTES (functions.GbtArtifact wire format — the engine-side analog of
  // the reference's pickled-XGBoost load at stock_pipeline.py:138) and
  // compiled into a native when/otherwise expression chain: bytes →
  // parsed trees → whole-stage-codegen'd scoring, no driver loop, no UDF.
  // The bytes cross a REAL storage boundary: loadFromStore writes the
  // artifact to a parquet model-store table once per session and the
  // query reads it back (scan → driver bytes → deserialize → compile).
  // The oracle scores with CASE WHEN SQL generated from the SAME parsed
  // model, so the full load path (deserialize + compile) is what the
  // hash-compare checks.
  // ---------------------------------------------------------------------
  private val q102 = QueryDef(
    "q102_model_artifact_score",
    (spark, dir) => {
      import spark.implicits._
      import graft.functions.GbtArtifact
      val model = GbtArtifact.loadFromStore(spark, "gbt_v1")
      val w = Window.partitionBy("ticker").orderBy("date")
      val prev = lag($"close", 1).over(w)
      WindowFeatures.bars(spark, dir)
        .withColumn("daily_return", ($"close" - prev) / prev)
        .withColumn("vol_signal", lit(1.0) / ($"volume".cast("double") + lit(1.0)))
        .withColumn("close_next", lead($"close", 1).over(w))
        .filter($"daily_return".isNotNull && $"close_next".isNotNull)
        .withColumn("pred_return",
          GbtArtifact.score(model, Seq($"daily_return", $"vol_signal")))
        .withColumn("predicted_price", $"close" * (lit(1.0) + $"pred_return"))
        .withColumn("model_type", lit("gbt_artifact_v1"))
        .select($"ticker", $"date", $"close", $"daily_return", $"vol_signal",
          $"pred_return", $"predicted_price", $"close_next".as("actual_price"),
          $"model_type")
        .orderBy($"ticker", $"date")
    },
    Some {
      val model = graft.functions.GbtArtifact
        .deserialize(graft.functions.GbtArtifact.demoArtifact)
      val scoreSql = graft.functions.GbtArtifact
        .scoreSql(model, Seq("daily_return", "vol_signal"))
      s"""
      WITH ${WindowFeatures.barsSql},
      feat AS (
        SELECT ticker, date, close, volume,
               (close - lag(close,1) OVER w) / lag(close,1) OVER w AS daily_return,
               1.0 / (CAST(volume AS DOUBLE) + 1.0) AS vol_signal,
               lead(close,1) OVER w AS close_next
        FROM bars WINDOW w AS (PARTITION BY ticker ORDER BY date)),
      scored AS (
        SELECT *, $scoreSql AS pred_return
        FROM feat WHERE daily_return IS NOT NULL AND close_next IS NOT NULL)
      SELECT ticker, date, close, daily_return, vol_signal, pred_return,
             close * (1.0 + pred_return) AS predicted_price,
             close_next AS actual_price,
             'gbt_artifact_v1' AS model_type
      FROM scored ORDER BY ticker, date"""
    })

  // ---------------------------------------------------------------------
  // q113 — MODEL-BASED quality filtering: the curation step where a small
  // trained classifier replaces hand-tuned quality heuristics (score
  // every doc with a model, keep above threshold). The quality GBT
  // artifact loads from the same parquet model store as q102
  // (bytes → validate → deserialize → compiled when/otherwise), scores
  // the q29 quality features row-by-row inside whole-stage codegen, and
  // emits the per-doc verdict. Per-row map work over a scan — no shuffle
  // except the output sort; at 100 TB this is a linear pass that writes
  // the kept partition, exactly like the heuristic filter it replaces.
  // Oracle: CASE WHEN SQL generated from the SAME parsed model over the
  // same feature CTE — left-fold order matches, so doubles hash-compare.
  // ---------------------------------------------------------------------
  private val q113 = QueryDef.deferred(
    "q113_model_quality_filter",
    (spark, dir) => {
      import spark.implicits._
      import graft.functions.GbtArtifact
      val model = GbtArtifact.loadFromStore(spark, "quality_v1")
      TextOps.withQuality(Tables.documents(spark, dir))
        .withColumn("q_score", GbtArtifact.score(model,
          Seq($"stop_ratio", $"avg_word_len", $"ws_tokens".cast("double"))))
        .withColumn("kept", ($"q_score" >= 0.5).cast("int"))
        .select($"doc_id", $"source", $"q_score", $"kept")
        .orderBy($"doc_id")
    }) {
      // DEFERRED oracle: the CASE-WHEN is generated from bytes read BACK
      // out of the written parquet model store — the same serialize →
      // columnar file → filtered scan → deserialize path the Spark side
      // takes — not from the in-process constant, so a store-write bug
      // would break the oracle too. Generated at dump time, when the
      // session (and therefore the store) exists.
      val spark = org.apache.spark.sql.SparkSession.active
      val model = graft.functions.GbtArtifact.loadFromStore(spark, "quality_v1")
      val scoreSql = graft.functions.GbtArtifact.scoreSql(model,
        Seq("(CAST(stop_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE))",
          "(CAST(nospace_chars AS DOUBLE) / CAST(ws_tokens AS DOUBLE))",
          "CAST(ws_tokens AS DOUBLE)"))
      s"""
      WITH q AS (${TextOps.qualitySql})
      SELECT doc_id, source, $scoreSql AS q_score,
             CASE WHEN $scoreSql >= 0.5 THEN 1 ELSE 0 END AS kept
      FROM q ORDER BY doc_id"""
    }

  // ---------------------------------------------------------------------
  // q122 — IN-ENGINE model training (batch perceptron): closes the model
  // triangle — q122 trains, q102/q113 store-load and score. The task is
  // heuristic distillation, a real curation pattern: learn a linear model
  // over the RAW integer counts (bias, tokens, stop-hits, chars) that
  // reproduces q29's nonlinear hand-tuned quality verdict, so the cheap
  // model can replace the heuristic at the scan. The batch perceptron is
  // the one classical trainer with NO transcendentals: each round scores
  // every doc against the current weights (margin = y·(w·x), exact BIGINT
  // products), sums y·x over misclassified docs (margin ≤ 0), and adds
  // the sum to w. Updates are order-independent integer sums, so training
  // is partitioning-independent and the oracle can re-train bit-exactly
  // as a chain of MATERIALIZED CTEs (the q117 discipline).
  //
  // Scale shape: the feature frame is one linear pass (persisted across
  // rounds); each round is ONE map-side-combined aggregation over it with
  // the weights inlined as literals — plans stay flat, no lineage growth,
  // and the per-round driver collect is the 1-row model state (k-means
  // discipline). 10 rounds = 10 scans of a 4-column integer frame.
  // ---------------------------------------------------------------------
  private val PerceptronRounds = 10

  private val q122 = QueryDef(
    "q122_perceptron_train",
    (spark, dir) => {
      import spark.implicits._
      val feats = TextOps.withQuality(Tables.documents(spark, dir))
        .select(
          when($"score" >= 0.6, 1L).otherwise(-1L).as("y"),
          lit(1L).as("x0"),
          $"ws_tokens".cast("long").as("x1"),
          $"stop_tokens".cast("long").as("x2"),
          $"nospace_chars".cast("long").as("x3"))
        .persist()
      try {
        var w = Array(0L, 0L, 0L, 0L)
        val hist = Seq.newBuilder[(Long, Long, Long, Long, Long, Long)]
        for (r <- 1 to PerceptronRounds) {
          val g = feats
            .withColumn("margin",
              $"y" * (lit(w(0)) * $"x0" + lit(w(1)) * $"x1" +
                lit(w(2)) * $"x2" + lit(w(3)) * $"x3"))
            .filter($"margin" <= 0L)
            .agg(
              coalesce(sum($"y" * $"x0"), lit(0L)).as("g0"),
              coalesce(sum($"y" * $"x1"), lit(0L)).as("g1"),
              coalesce(sum($"y" * $"x2"), lit(0L)).as("g2"),
              coalesce(sum($"y" * $"x3"), lit(0L)).as("g3"),
              count(lit(1)).as("n_mis"))
            .collect()(0) // 1-row model state per round — k-means discipline
          w = Array(w(0) + g.getLong(0), w(1) + g.getLong(1),
            w(2) + g.getLong(2), w(3) + g.getLong(3))
          hist += ((r.toLong, w(0), w(1), w(2), w(3), g.getLong(4)))
        }
        hist.result()
          .toDF("round", "w_bias", "w_tokens", "w_stop", "w_chars", "n_mis")
          .orderBy($"round")
      } finally feats.unpersist()
    },
    Some {
      val rounds = (1 to PerceptronRounds).map { r =>
        val prev = s"r${r - 1}"
        // LEFT JOIN keeps the round total when no doc misclassifies;
        // count(f.y) (not count(*)) so the null row doesn't count as one
        s"""r$r AS MATERIALIZED (
        SELECT w0 + coalesce(sum(y * x0), 0) AS w0,
               w1 + coalesce(sum(y * x1), 0) AS w1,
               w2 + coalesce(sum(y * x2), 0) AS w2,
               w3 + coalesce(sum(y * x3), 0) AS w3,
               count(f.y) AS n_mis
        FROM $prev LEFT JOIN f
          ON y * (w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3) <= 0
        GROUP BY w0, w1, w2, w3)"""
      }.mkString(",\n      ")
      val emit = (1 to PerceptronRounds).map { r =>
        s"""SELECT CAST($r AS BIGINT) AS round, CAST(w0 AS BIGINT) AS w_bias,
               CAST(w1 AS BIGINT) AS w_tokens, CAST(w2 AS BIGINT) AS w_stop,
               CAST(w3 AS BIGINT) AS w_chars, CAST(n_mis AS BIGINT) AS n_mis
        FROM r$r"""
      }.mkString("\n      UNION ALL ")
      s"""
      WITH q AS (${TextOps.qualitySql}),
      f AS (
        SELECT CASE WHEN score >= 0.6 THEN 1 ELSE -1 END AS y,
               1 AS x0, ws_tokens AS x1, stop_tokens AS x2,
               nospace_chars AS x3
        FROM q),
      r0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                    CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
      $rounds
      SELECT * FROM ($emit) ORDER BY round"""
    })

  // ---------------------------------------------------------------------
  // q263 — RANKER EVALUATION (exact AUC + calibration table): how well
  // does the LM fluency score (negated bits-per-bigram, off the
  // lm_doc_bits silver) RANK the heuristic quality label (q29's
  // score ≥ 0.6)? q259 asked whether two binary flags agree; this is
  // the threshold-free readout — the ROC area. AUC is computed EXACTLY
  // as the Mann–Whitney statistic in integer arithmetic, and never
  // ranks the corpus: per DISTINCT score value, positive/negative
  // counts (one map-combinable rollup), then U×2 = Σ_s (2·a_s·B_<s +
  // a_s·b_s) over the ≤ |milli score domain| distinct-value rollup —
  // a value-domain cumulative (the q207 grid discipline), never a
  // per-doc rank window. auc_milli = 1000·U2 div (2·n1·n0) is an
  // exact rational. The calibration table buckets the score in whole
  // deci-bits (the fixture corpus spans < one whole bit) with exact
  // permille positive rates. Int64 envelope: U2 ≤
  // 2·n² — exact to n ≈ 2·10⁹ docs; past that the U accumulator moves
  // to DECIMAL(38) (the q120 wider-lane note).
  // ---------------------------------------------------------------------
  private val q263 = QueryDef(
    "q263_ranker_auc",
    (spark, dir) => {
      import spark.implicits._
      val y = TextOps.withQuality(Tables.documents(spark, dir))
        .select($"doc_id", ($"score" >= 0.6).cast("long").as("y"))
      val d = graft.operators.Search.lmAllDocs(spark, dir)
        .select($"doc_id", (-$"milli").as("s"))
        .join(y, "doc_id")
      val perS = d.groupBy($"s")
        .agg(sum($"y").as("a"), (count(lit(1)) - sum($"y")).as("b"))
      val wS = Window.orderBy($"s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = perS
        .withColumn("bcum", coalesce(sum($"b").over(wS), lit(0L)))
        .withColumn("t", lit(2L) * $"a" * $"bcum" + $"a" * $"b")
      val auc = cum.agg(sum($"a").as("n1"), sum($"b").as("n0"),
          sum($"t").as("u2"))
        .withColumn("auc_milli",
          expr("(1000 * u2) div (2 * n1 * n0)"))
        .select($"n1", $"n0", $"auc_milli")
      val bands = d
        .withColumn("band", expr(graft.functions.Portable.bandSql("s", 100L, "div")))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_docs"), sum($"y").as("n_pos"))
        .withColumn("pos_rate_milli", expr("(1000 * n_pos) div n_docs"))
      bands.crossJoin(broadcast(auc))
        .select($"band", $"n_docs", $"n_pos", $"pos_rate_milli",
          $"n1", $"n0", $"auc_milli")
        .orderBy($"band")
    },
    Some(s"""
      WITH ${graft.operators.Search.lmAllDocsCtes},
      q AS (${TextOps.qualitySql}),
      d AS (
        SELECT a.doc_id, -a.milli AS s,
               CASE WHEN q.score >= 0.6 THEN 1 ELSE 0 END AS y
        FROM alldocs a JOIN q ON a.doc_id = q.doc_id),
      pers AS (
        SELECT s, CAST(sum(y) AS BIGINT) AS a,
               CAST(count(*) - sum(y) AS BIGINT) AS b
        FROM d GROUP BY s),
      cum AS (
        SELECT *, coalesce(CAST(sum(b) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS bcum
        FROM pers),
      auc AS (
        SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n0,
               CAST(sum(2 * a * bcum + a * b) AS BIGINT) AS u2
        FROM cum),
      bands AS (
        SELECT ${graft.functions.Portable.bandSql("s", 100L, "//")} AS band,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(y) AS BIGINT) AS n_pos
        FROM d GROUP BY 1)
      SELECT band, n_docs, n_pos,
             CAST((1000 * n_pos) // n_docs AS BIGINT) AS pos_rate_milli,
             n1, n0,
             CAST((1000 * u2) // (2 * n1 * n0) AS BIGINT) AS auc_milli
      FROM bands, auc ORDER BY band"""))

  override val defs: Seq[QueryDef] =
    Seq(q31, q32, q33, q102, q113, q122, q263)
}
