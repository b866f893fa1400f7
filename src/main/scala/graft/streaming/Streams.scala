package graft.streaming

import graft.{QueryDef, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Structured Streaming layer (SURVEY.md §2.10 T1–T6, §3.1/§3.2): the
  * reference's Kafka micro-batch pipelines re-built on the file source so
  * the same plans run hermetically over the fixture tables. In production
  * the source swaps to `readStream.format("kafka")` — the downstream plan
  * (JSON-decode → watermark → windowed agg → sink) is IDENTICAL; that swap
  * is configuration, not code (SURVEY.md §7.1).
  *
  * The transformation builders are shared between the streaming queries
  * here and their batch twins in CoreBatch (q04), so streaming/batch
  * equivalence holds by construction and the driver's batch DuckDB oracle
  * legitimately checks the streaming plan's semantics.
  *
  * Scale notes: the windowed agg is Spark's incremental stateful
  * aggregation — partial aggregation map-side, state keyed by
  * (window, event_type) in the state store, watermark (T1) bounding state
  * growth. The stream–static join broadcasts the dim side per micro-batch
  * — the stream side never shuffles (§3.2's BroadcastHashJoin).
  */
object Streams extends QueryModule {

  /** Streaming scan of the events fixture (S2 as file source). Schema is
    * declared, never inferred (§1.2); nanosecond timestamps arrive as
    * longs (Tables.events note) and are truncated to µs exactly like the
    * batch reader and the DuckDB oracle.
    */
  private[graft] def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = new StructType()
      .add("event_id", LongType).add("ts", LongType).add("user_id", LongType)
      .add("event_type", StringType).add("value", DoubleType)
      .add("props", StringType)
    // the file source wants a directory: scan the fixture dir filtered to
    // the events table file
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The §3.1 silver transform: watermark (T1) + 15-min tumbling window
    * (T2) feature agg. Works on a streaming OR batch events frame.
    */
  private[graft] def features15m(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .filter($"ts".isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "15 minutes"), $"event_type")
      .agg(
        count(lit(1)).as("post_count"),
        sum($"value".cast(DecimalType(28, 2))).cast("double").as("total_score"),
        max($"value").as("max_score"))
      .select($"window.start".as("window_start"), $"window.end".as("window_end"),
        $"event_type", $"post_count", $"total_score", $"max_score")
  }

  private def runToMemory(df: DataFrame, mode: String): DataFrame = {
    val spark = df.sparkSession
    val name = s"graft_mem_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  // ---------------------------------------------------------------------
  // q41 — the §3.1 streaming feature pipeline end-to-end: streaming scan →
  // watermark → windowed agg, run as a real StreamingQuery into a memory
  // sink (complete mode emits every window regardless of watermark, which
  // is what a bounded replay needs; append-mode emission timing is covered
  // by StreamingSpec). Result equals the batch plan — checked by DuckDB.
  // ---------------------------------------------------------------------
  private val q41 = QueryDef(
    "q41_stream_features_15m",
    (spark, dir) => {
      import spark.implicits._
      runToMemory(features15m(eventsStream(spark, dir)), "complete")
        .orderBy($"window_start", $"event_type")
    },
    Some("""
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
             time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
             event_type, count(*) AS post_count,
             CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_score,
             max(value) AS max_score
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2, 3
      ORDER BY window_start, event_type"""))

  // ---------------------------------------------------------------------
  // q42 — stream–static join (§3.2, J1): streaming events inner-join the
  // static customer dim on user_id; the static side is broadcast every
  // micro-batch. Stateless ⇒ append mode.
  // ---------------------------------------------------------------------
  private val q42 = QueryDef(
    "q42_stream_static_join",
    (spark, dir) => {
      import spark.implicits._
      val cust = Tables.customer(spark, dir)
        .select($"c_custkey", $"c_name", $"c_mktsegment")
      val joined = eventsStream(spark, dir)
        .join(broadcast(cust), $"user_id" === $"c_custkey", "inner")
        .select($"event_id", $"user_id", $"event_type", $"value", $"c_name", $"c_mktsegment")
      runToMemory(joined, "append").orderBy($"event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_name, c.c_mktsegment
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id"""))

  // ---------------------------------------------------------------------
  // q43 — foreachBatch micro-batch sink (S6: the reference's Mongo append
  // sink, here a parquet append per batch) then a batch re-read of the
  // sunk bronze table — the full bronze round-trip of §3.1's RAW branch.
  // ---------------------------------------------------------------------
  private val q43 = QueryDef(
    "q43_stream_sink_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val out = Files.createTempDirectory("graft_bronze_").toString
      val q = eventsStream(spark, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        // T3/T4: explicit trigger + checkpointed progress, as the
        // reference configures per query (reddit_pipeline.py:148-149)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft_ckpt_").toString)
        .start()
      q.awaitTermination() // AvailableNow terminates when caught up
      q.stop()
      spark.read.parquet(out)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(28, 2))).cast("double").as("total_value"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
             count(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type"""))

  override val defs: Seq[QueryDef] = Seq(q41, q42, q43)
}
