package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The declared STREAMING-STATE-SIZE registry — the stateful twin of
  * plans/WindowBounds: every stateful streaming query holds a state
  * store whose row count must be bounded by something the operator can
  * name (distinct keys, windows in the data's time span, watermark-
  * retained rows, a sketch capacity), because unbounded state is the
  * streaming analog of the unsplittable-window straggler — it grows
  * until an executor dies, usually in production and at 3 a.m.
  *
  * Unlike a comment, every bound here is MEASURED: Streams.runToParquet
  * records the query's final state census (Σ numRowsTotal over its
  * stateful operators at termination), and StateBoundsSpec re-runs each
  * declared query on the fixture and asserts census ≤ limit(fixture) —
  * a bound formula that recomputes the declared invariant from the
  * input tables. A new stateful query without a declaration fails the
  * coverage test.
  *
  * Exactness levels, stated per row: `=` bounds are tight (one state
  * row per key by construction); `≤` bounds are eviction-dependent
  * (watermarks may purge below the cap on a bounded replay).
  */
object StateBounds {

  final case class StateBound(
      query: String,
      /** the invariant that bounds state rows */
      bound: String,
      /** recompute the numeric limit from the fixture tables */
      limit: (SparkSession, String) => Long)

  private def events(spark: SparkSession, dir: String) =
    Tables.events(spark, dir).filter(col("ts").isNotNull)

  private def buckets15(spark: SparkSession, dir: String): Long =
    events(spark, dir)
      .select(window(col("ts"), "15 minutes"), col("event_type"))
      .distinct().count()

  private def users(spark: SparkSession, dir: String): Long =
    Tables.events(spark, dir).select(col("user_id")).distinct().count()

  private def types(spark: SparkSession, dir: String): Long =
    Tables.events(spark, dir).select(col("event_type")).distinct().count()

  val declared: Seq[StateBound] = Seq(
    StateBound("q41_stream_features_15m",
      "= distinct (15-min window, event_type) groups in the span",
      buckets15),
    StateBound("q104_kafka_stream_features",
      "= the q41 groups (same agg over the kafka-replay twin)",
      buckets15),
    StateBound("q157_stream_sliding_windows",
      "= distinct (15-min/5-min hop window, event_type) groups — each" +
        " event lands in 3 hops",
      (s, d) => events(s, d)
        // batch hop windows expand one row per covering hop (the
        // analyzer's TimeWindowing expansion), same as the stream
        .select(window(col("ts"), "15 minutes", "5 minutes").as("w"),
          col("event_type"))
        .distinct().count()),
    StateBound("q55_stateful_user_state",
      "= one ValueState row per distinct user", users),
    StateBound("q128_transform_with_state",
      "= one ValueState row per distinct user (q55's fold on the new API)",
      users),
    StateBound("q74_stream_session_window",
      "= one merged session per (user, ≤30-min-gap run)",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, d)
          .withColumn("gap", unix_timestamp(col("ts"))
            - unix_timestamp(lag("ts", 1).over(w)))
          .filter(col("gap").isNull || col("gap") > 30 * 60)
          .count()
      }),
    StateBound("q77_stream_dedup",
      "≤ one key row per distinct event_id (watermark evicts behind the" +
        " advancing clock)",
      (s, d) => events(s, d).select("event_id").distinct().count()),
    StateBound("q86_stream_stream_join",
      "≤ purchase rows + click rows (symmetric join state; the range" +
        " condition + watermarks evict, so the cap is both sides whole)",
      (s, d) => events(s, d)
        .filter(col("event_type").isin("purchase", "click")).count()),
    StateBound("q147_stream_outer_join",
      "≤ both join sides whole (outer join retains the null-side rows" +
        " until watermark proof)",
      (s, d) => events(s, d)
        .filter(col("event_type").isin("purchase", "click")).count()),
    StateBound("q136_stream_kmv_sketch",
      "= one KMV sketch row per event_type (sketch size ≤ k inside the" +
        " row, not in the store)",
      types),
    StateBound("q173_stream_hll",
      "= one register row per (event_type, 64-bucket) cell present",
      (s, d) => events(s, d).filter(col("user_id").isNotNull)
        .select(col("event_type"),
          pmod(graft.functions.Portable.md5Hash64(col("user_id").cast("string")),
            lit(64L)))
        .distinct().count()),
    StateBound("q206_stream_heavy_users",
      "= one Misra–Gries buffer row per event_type (≤ k entries inside" +
        " the row)",
      types),
    StateBound("q317_stream_quantile_sketch",
      "= one bottom-k quantile-sketch row per event_type (≤ k (hash," +
        " value) pairs + one count inside the row, not in the store)",
      types),
    StateBound("q223_stream_triple_barrier",
      "= one ValueState row per ticker (≤ H+1 open entries inside)",
      (s, d) => graft.operators.WindowFeatures.tickersOf(s, d)),
    StateBound("q235_stream_dollar_bars",
      "= one ValueState row per ticker (running notional + the single" +
        " open bar, constant size)",
      (s, d) => graft.operators.Series.tapeTickersOf(s, d)),
    StateBound("q244_stream_imbalance_bars",
      "= one ValueState row per ticker (tick-rule carry + the open" +
        " imbalance bar, constant size)",
      (s, d) => graft.operators.Series.tapeTickersOf(s, d)),
    StateBound("q271_stream_vpin",
      "= one ValueState row per ticker (tick-rule carry + open bucket +" +
        " the ≤(VpinFrame−1)-entry completed-bucket ring, constant size)",
      (s, d) => graft.operators.Series.tapeTickersOf(s, d)),
    StateBound("q281_stream_kyle",
      "= one ValueState row per ticker (tick-rule carry + open bucket's" +
        " signed flow + prior completed bucket's last price + five OLS" +
        " accumulators, constant size)",
      (s, d) => graft.operators.Series.tapeTickersOf(s, d)),
    StateBound("q290_stream_drawdown",
      "= one ValueState row per ticker (running peak + running max" +
        " drawdown — two longs, constant size)",
      (s, d) => graft.operators.Series.tapeTickersOf(s, d)),
    StateBound("q240_stream_cusum_events",
      "= one ValueState row per ticker (last close + the two CUSUM" +
        " accumulators, constant size)",
      (s, d) => graft.operators.WindowFeatures.tickersOf(s, d)),
    StateBound("q268_stream_session_timeout",
      "≤ 2 state rows per user with an open session (the single" +
        " open-session ValueState + its one pending event-time timer)",
      (s, d) => 2L * users(s, d)),
    StateBound("q265_stream_drift_monitor",
      "= one ValueState row per event_type (band × parity count cells" +
        " inside — value-domain-bounded, never event-bounded)",
      types),
    StateBound("q253_stream_priority_sample",
      "= one ValueState row per source (top-(K+1) candidate list +" +
        " n_seen inside, constant size)",
      (s, d) => Tables.documents(s, d).select(col("source"))
        .distinct().count()),
    StateBound("q42_stream_static_join",
      "stateless: broadcast static side per micro-batch, append-only",
      (_, _) => 0L)
  )

  def names: Seq[String] = declared.map(_.query)
}
