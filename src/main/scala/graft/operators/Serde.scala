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

  override val defs: Seq[QueryDef] = Seq(q53, q54, q130)
}
