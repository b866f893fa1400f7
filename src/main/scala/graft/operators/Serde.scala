package graft.operators

import graft.{QueryDef, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serialization surface + asymmetric-key joins: the producer side of the
  * reference's Kafka messaging (S10: dict→JSON, keyed by id —
  * producer_training_data.py:20-26) and the notebooks' date-only merges
  * (J3/J4: per-day features broadcast across all tickers of the day —
  * 05 · cell 4, app.py:360-362).
  */
object Serde extends QueryModule {

  // ---------------------------------------------------------------------
  // q53 — JSON serialize/deserialize round-trip (S10 producer + S3
  // consumer in one plan): row → to_json(struct(*)) keyed by id (exactly
  // the producer's wire format), then from_json back with the declared
  // schema and a field-level compare. A lossy round-trip would show as
  // n_mismatch > 0 — the oracle pins it to 0 while proving the count.
  // ---------------------------------------------------------------------
  private val q53 = QueryDef(
    "q53_json_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      val schema = new StructType()
        .add("event_id", LongType).add("user_id", LongType)
        .add("event_type", StringType).add("value", DoubleType)
      val wire = Tables.events(spark, dir)
        .select($"event_id".cast("string").as("key"),
          to_json(struct($"event_id", $"user_id", $"event_type", $"value")).as("value"))
      wire
        .withColumn("d", from_json($"value", schema))
        .withColumn("ok",
          ($"d.event_id".cast("string") === $"key") && $"d.event_type".isNotNull)
        .agg(
          count(lit(1)).as("n_messages"),
          sum(when($"ok", 0L).otherwise(1L)).as("n_mismatch"),
          countDistinct($"d.event_type").as("n_types"))
    },
    Some("""
      SELECT count(*) AS n_messages,
             CAST(0 AS BIGINT) AS n_mismatch,
             count(DISTINCT event_type) AS n_types
      FROM events"""))

  // ---------------------------------------------------------------------
  // q54 — date-only asymmetric join (J3/J4): daily market-wide event
  // features (keyed by date alone) broadcast onto every per-type bar of
  // that date — the deliberate key asymmetry of the notebook merges.
  // ---------------------------------------------------------------------
  private val q54 = QueryDef(
    "q54_daily_broadcast_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
      val bars = CoreBatch.dailyEvents(spark, dir)
        .select($"event_type", $"day".as("date"), $"volume")
      val daily = ev.groupBy(to_date($"ts").as("date"))
        .agg(
          count(lit(1)).as("market_events"),
          countDistinct($"user_id").as("market_users"))
      bars.join(broadcast(daily), Seq("date"), "left")
        .select($"date", $"event_type", $"volume", $"market_events", $"market_users")
        .orderBy($"date", $"event_type")
    },
    Some("""
      WITH bars AS (
        SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS volume
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      daily AS (
        SELECT CAST(ts AS DATE) AS date, count(*) AS market_events,
               count(DISTINCT user_id) AS market_users
        FROM events WHERE ts IS NOT NULL GROUP BY 1)
      SELECT b.date, b.event_type, b.volume, d.market_events, d.market_users
      FROM bars b LEFT JOIN daily d ON b.date = d.date
      ORDER BY b.date, b.event_type"""))

  // ---------------------------------------------------------------------
  // q130 — VariantType semi-structured ingestion (the Spark 4 successor
  // to schema'd `from_json` when the payload schema drifts): `parse_json`
  // shreds the props JSON into an open VARIANT value once at the scan
  // edge; downstream `variant_get` path extraction is typed and
  // codegen'd, and `try_variant_get` degrades missing paths to NULL
  // instead of failing the batch — the schema-evolution posture a 100 TB
  // ingest needs (producers add fields without coordinating redeploys).
  // Scale shape: per-row map work into one partial+final aggregate, no
  // UDF, no shuffle beyond the rollup.
  // ---------------------------------------------------------------------
  private val q130 = QueryDef(
    "q130_variant_shred",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("v", parse_json($"props"))
        .withColumn("k", variant_get($"v", "$.k", "bigint"))
        .withColumn("absent", try_variant_get($"v", "$.not_there", "bigint"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"),
          sum(when($"k".isNull, 1L).otherwise(0L)).as("n_null_k"),
          sum(when($"absent".isNull, 1L).otherwise(0L)).as("n_absent"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
             CAST(sum(CASE WHEN json_extract_string(props, '$.not_there') IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_absent
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // q308 — CHAT-TEMPLATE CONFORMANCE AUDIT: the SFT-data validation gate
  // an instruction-tuning pipeline runs over conversation JSONL before
  // training — every row must parse, hold exactly the expected turn
  // structure (user then assistant), and carry non-empty content. The
  // fixture has no chat data, so the query renders a deterministic
  // two-turn conversation per document and plants one malformation
  // class on a hash-selected quarter each (the q67/q301 plant-then-
  // operate discipline): m0 = well-formed, m1 = roles swapped
  // (assistant speaks first), m2 = empty assistant content, m3 =
  // truncated JSON (parse failure). The validator must classify every
  // row into exactly one bucket — counts are censused per source and
  // the well-formed payloads are checksummed. Spark validates through
  // from_json (null on corrupt records — the real schema-enforcement
  // path); the oracle mirrors with DuckDB's json_valid/json_extract.
  // Per-row map work + one rollup — the q53 serde envelope.
  // ---------------------------------------------------------------------
  private val q308 = QueryDef(
    "q308_chat_template_audit",
    (spark, dir) => {
      import spark.implicits._
      import graft.functions.Portable
      val mExpr = Portable.md5Hash64(
        concat(lit("chat|"), $"doc_id".cast("string"))) % 4
      val rendered = Tables.documents(spark, dir)
        .withColumn("m", mExpr)
        .withColumn("u_text", substring($"text", 1, 40))
        .withColumn("a_text",
          when($"m" === 2, lit(""))
            .otherwise(concat(lit("ok "), $"doc_id".cast("string"))))
        .withColumn("r0", when($"m" === 1, lit("assistant")).otherwise(lit("user")))
        .withColumn("r1", when($"m" === 1, lit("user")).otherwise(lit("assistant")))
        .withColumn("convo_full", concat(
          lit("""[{"role":""""), $"r0", lit("""","content":""""), $"u_text",
          lit(""""},{"role":""""), $"r1", lit("""","content":""""), $"a_text",
          lit(""""}]""")))
        .withColumn("convo",
          when($"m" === 3, expr("substring(convo_full, 1, length(convo_full) - 3)"))
            .otherwise($"convo_full"))
      val schema = ArrayType(StructType(Seq(
        StructField("role", StringType), StructField("content", StringType))))
      val audited = rendered
        .withColumn("parsed", from_json($"convo", schema))
        .withColumn("parse_ok", $"parsed".isNotNull)
        .withColumn("role_ok", $"parse_ok" && size($"parsed") === 2 &&
          $"parsed".getItem(0).getField("role") === "user" &&
          $"parsed".getItem(1).getField("role") === "assistant")
        .withColumn("content_ok", $"parse_ok" &&
          length($"parsed".getItem(0).getField("content")) > 0 &&
          length($"parsed".getItem(1).getField("content")) > 0)
        .withColumn("valid", $"parse_ok" && $"role_ok" && $"content_ok")
      audited.groupBy($"source")
        .agg(
          count(lit(1)).as("n_convos"),
          sum(when(!$"parse_ok", 1L).otherwise(0L)).as("n_parse_fail"),
          sum(when($"parse_ok" && !$"role_ok", 1L).otherwise(0L))
            .as("n_role_violation"),
          sum(when($"parse_ok" && $"role_ok" && !$"content_ok", 1L)
            .otherwise(0L)).as("n_empty_content"),
          sum($"valid".cast("long")).as("n_valid"),
          sum(when($"valid",
            Portable.md5Hash64($"convo") % lit(Portable.P)).otherwise(0L))
            .as("valid_checksum"))
        .orderBy($"source")
    },
    Some(s"""
      WITH r0 AS (
        SELECT doc_id, source, text,
               ${graft.functions.Portable.md5Hash64Sql(
                 "('chat|' || CAST(doc_id AS VARCHAR))")} % 4 AS m
        FROM documents),
      r1 AS (
        SELECT doc_id, source, m,
               '[{"role":"' ||
                 CASE WHEN m = 1 THEN 'assistant' ELSE 'user' END ||
                 '","content":"' || substring(text, 1, 40) ||
                 '"},{"role":"' ||
                 CASE WHEN m = 1 THEN 'user' ELSE 'assistant' END ||
                 '","content":"' ||
                 CASE WHEN m = 2 THEN '' ELSE 'ok ' || doc_id END ||
                 '"}]' AS convo_full
        FROM r0),
      r2 AS (
        SELECT source, m,
               CASE WHEN m = 3 THEN
                 substring(convo_full, 1, length(convo_full) - 3)
               ELSE convo_full END AS convo
        FROM r1),
      r3 AS (
        -- DuckDB's json_extract THROWS on malformed input (no NULL-on-
        -- corrupt path like from_json), so extraction runs on a
        -- sanitized twin: invalid rows read as an empty array
        SELECT source, convo, json_valid(convo) AS parse_ok,
               CASE WHEN json_valid(convo) THEN convo ELSE '[]' END AS jdoc
        FROM r2),
      aud AS (
        SELECT source, convo, parse_ok,
               parse_ok
                 AND json_array_length(jdoc) = 2
                 AND json_extract_string(jdoc, '$$[0].role') = 'user'
                 AND json_extract_string(jdoc, '$$[1].role') = 'assistant'
                 AS role_ok,
               parse_ok
                 AND length(json_extract_string(jdoc, '$$[0].content')) > 0
                 AND length(json_extract_string(jdoc, '$$[1].content')) > 0
                 AS content_ok
        FROM r3)
      SELECT source, count(*) AS n_convos,
             CAST(sum(CASE WHEN NOT parse_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_parse_fail,
             CAST(sum(CASE WHEN parse_ok AND NOT role_ok THEN 1 ELSE 0 END)
               AS BIGINT) AS n_role_violation,
             CAST(sum(CASE WHEN parse_ok AND role_ok AND NOT content_ok
               THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_content,
             CAST(sum(CASE WHEN parse_ok AND role_ok AND content_ok
               THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
             CAST(sum(CASE WHEN parse_ok AND role_ok AND content_ok
               THEN ${graft.functions.Portable.md5Hash64Sql("convo")}
                 % ${graft.functions.Portable.P} ELSE 0 END) AS BIGINT)
               AS valid_checksum
      FROM aud GROUP BY source ORDER BY source"""))

  override val defs: Seq[QueryDef] = Seq(q53, q54, q130, q308)
}
