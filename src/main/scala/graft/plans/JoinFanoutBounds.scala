package graft.plans

/** The declared JOIN-FANOUT-BOUND registry — the fourth invariant
  * registry, closing the last undeclared straggler class after windows
  * ([[WindowBounds]]), streaming state (streaming/StateBounds), and
  * duplicate heavy subtrees ([[SharedSubtrees]]).
  *
  * Every self-join / pair-generation / range-join site in the engine
  * multiplies rows: a blocked pair screen emits |block cell|² rows per
  * cell, a wedge join emits Σ deg² candidates, a prefix-filtered
  * similarity join emits per-candidate verification rows. Each such
  * site is bounded by SOMETHING — a calendar-sized blocking key, a
  * dimension-sized universe, a degree cap, a df/length prefix bound —
  * but until round 12 those bounds lived in comments at each site,
  * exactly where window bounds lived before round 9 (and the r7 q190 /
  * r8 q184 history says comment-only bounds eventually ship a
  * corpus-sized cell).
  *
  * This registry makes the bound a DECLARATION checked by CI:
  * JoinFanoutSpec walks the optimized plan of every SparkEntry query
  * and every Silver build, classifies each join, auto-accepts the
  * shapes whose fan-out is bounded BY CONSTRUCTION (see the spec's
  * acceptance ladder), and fails on any remaining multiplying join in a
  * query with no declaration here — an undeclared pair join is a build
  * error, not a judge finding.
  *
  * A declaration is a contract about the JOIN'S BLOCKING GRAIN, not
  * about the data: `blockKeys` names the equi-key(s) that partition the
  * candidate space (validated by the spec against the join's actual
  * equi-condition), and `cellBound` states why one block cell stays
  * bounded at 100× data — so a reviewer of a new consumer knows exactly
  * which invariant to re-check.
  */
object JoinFanoutBounds {

  /** One declared fan-out site.
    *
    * @param query     SparkEntry query name (or "silver:<table>") that
    *                  plans the join
    * @param blockKeys the blocking equi-keys as they appear in the join
    *                  condition (left-side names; empty when the site is
    *                  a declared-cartesian whose bound is the operand
    *                  sizes themselves)
    * @param cellBound why rows-per-block-cell (and the resulting pair
    *                  volume) stays bounded as the data scales 100×
    */
  final case class FanoutSite(
      query: String, blockKeys: Seq[String], cellBound: String)

  /** The declared sites. One entry covers every hazard join the named
    * query plans whose equi-keys include the declared blocking keys;
    * the spec cross-checks the keys against the plan.
    */
  val declared: Seq[FanoutSite] = Seq(
    // ----- monthly cross-section pair screens (calendar × universe) ----
    FanoutSite("q250_cointegration", Seq("mon"),
      "stage-1 pair moments block on (region, month): |universe/region|²" +
        " pairs per month cell at MONTHLY grain — the universe is the" +
        " ticker dimension (supplier catalog), not fact rows; months are" +
        " calendar-bounded. Stage 2 re-joins only the broadcast top-K" +
        " screened pairs (auto-accepted small side)."),
    FanoutSite("q298_corr_clusters", Seq("mon", "reg"),
      "return-correlation edges block on (region, month):" +
        " |universe/region|² pairs per cell at monthly grain. NOTE the" +
        " universe here is the supplier-as-ticker dimension, which the" +
        " FIXTURE grows with SF (1k at sf0.1) unlike a real bounded" +
        " ticker universe — the hot-region adversarial replay in" +
        " ScaleBehaviorSpec plants a region holding half the universe" +
        " and asserts the per-cell pair volume matches the blocked" +
        " |cell|·(|cell|−1)/2 budget exactly (no unblocked leak), which" +
        " is the declared contract: pair volume is quadratic in the" +
        " UNIVERSE dimension and linear in nothing else."),
    FanoutSite("q307_pairs_backtest", Seq("mon"),
      "pair SELECTION is q298's region-blocked monthly screen (same" +
        " |universe/region|² budget); the spread legs join is mbars ×" +
        " mbars at monthly grain where BOTH sides are first semi-reduced" +
        " by the broadcast top-1 pair (≤ 1 row per month per side by the" +
        " silver's (ticker, mon) grain) — everything downstream is one" +
        " ≤ |months|-row frame keyed (ta, tb)."),
    FanoutSite("q313_pairs_backtest_oos", Seq("mon"),
      "q307's exact join shapes under the walk-forward split: the pair" +
        " SELECTION is q298's region-blocked monthly screen restricted" +
        " to in-sample months (same |universe/region|² budget, fewer" +
        " month cells); the spread legs join is mbars × mbars at" +
        " monthly grain where BOTH sides are first semi-reduced by the" +
        " broadcast top-1 pair (≤ 1 row per month per side by the" +
        " silver's (ticker, mon) grain) — everything downstream is one" +
        " ≤ |months|-row frame keyed (ta, tb)."),
    FanoutSite("q311_quantile_sketch", Seq("event_type"),
      "DKW audit join: the fact stream joins the BROADCAST estimate" +
        " table — ≤ |percentiles| (a 5-literal array) rows per" +
        " event_type cell by construction (explode of a constant" +
        " literal over the sketch rollup), so the fan-out is a ×5" +
        " constant, invariant to corpus growth. The sketch pass itself" +
        " is one map-side-combined aggregate, no join at all; a 100 TB" +
        " deployment ships only that pass and skips the audit."),
    FanoutSite("q297_mann_kendall", Seq("ticker"),
      "Mann–Kendall sign/slope pairs block per ticker at MONTHLY grain:" +
        " |months|²/2 pairs per ticker cell — quadratic in the calendar" +
        " span, invariant to fact-row volume (the monthly_bars silver is" +
        " the input)."),
    // (q291's Bartlett lag self-joins are declared below with the other
    // materialized-table sites: since r14 the γ series is materialized,
    // so its per-month uniqueness sits behind a FileScan.)
    // ----- similarity / dedup candidate generation (prefix/band caps) --
    FanoutSite("q37_ngram_jaccard", Seq("hs"),
      "blocked n-gram candidate join: per-gram postings are df-bounded" +
        " by the rare-gram blocking filter (df ≤ MaxDf), so one gram" +
        " cell emits ≤ MaxDf² candidate pairs; doc length is bounded by" +
        " the MaxDocChars guard upstream."),
    FanoutSite("q232_ppjoin", Seq("hs"),
      "PPJoin prefix-token candidates: only PREFIX tokens (length-cap" +
        " bounded via guardedDocs + per-doc gram cap) generate" +
        " candidates, and the positional filter prunes before" +
        " verification — per-token cells are df-bounded by the prefix" +
        " pruning theorem (Xiao et al. 2011)."),
    FanoutSite("q163_gram_containment", Seq("s"),
      "asymmetric containment candidates block on shared 3-gram shingles" +
        " within a language block (df-capped postings); the guarded doc" +
        " length bounds grams per doc, the containment threshold is" +
        " verified on exact intersection counts after the blocked join."),
    FanoutSite("q151_triangle_count", Seq("i", "j"),
      "triangle closure on the near-dup graph: the wedge join blocks on" +
        " the shared endpoint of minhash_pairs edges — Σ deg² wedges" +
        " where degree is bounded by the LSH band-bucket cap that built" +
        " the edge silver (a doc collides with ≤ bucket-size docs per" +
        " band), so wedge volume is edges × banded-degree, not |docs|²."),
    FanoutSite("q287_link_predict", Seq("w"),
      "wedge closure blocks on the shared co-purchase neighbor: Σ deg²" +
        " wedges, with the repeat-co-occurrence floor (≥ 2 shared" +
        " baskets) capping the effective degree of the wedge pivot — the" +
        " Liben-Nowell screen's standard volume bound; basket size is" +
        " schema-bounded (≤ 7 lineitems per order)."),
    // ----- graph-iteration node joins over materialized tables --------
    // (r14: pageRank's sym/deg and q291's γ series are materialized
    // once — guide §2.4 — so the spec can no longer SEE the uniqueness
    // of the aggregate that built the parquet; these declarations state
    // it. The build sites are in this repo: deg/wdeg = one groupBy(node)
    // row per node, sym = the symmetrized edge list, γ = one row per
    // month, chosenOos = one row per CSCV mask.)
    FanoutSite("q160_pagerank", Seq("node"),
      "PageRank round joins over the materialized graph: rank ⋈ deg on" +
        " node is 1:1 (deg is one groupBy(node) row per node by its" +
        " build); rank ⋈ sym on node=esrc fans out exactly deg(node) —" +
        " bounded by the LSH band-bucket cap that built the near-dup" +
        " edge silver. Pair volume per round = Σ deg = 2·|edges|."),
    FanoutSite("q201_weighted_pagerank", Seq("node"),
      "same contract as q160 over the weighted graph: wdeg unique per" +
        " node by build, wsym fan-out = deg(node) ≤ the band-bucket cap;" +
        " per-round volume 2·|edges|."),
    FanoutSite("q167_canonical_docs", Seq("node"),
      "composes q160's PageRank rounds (same materialized sym/deg — " +
        "deg unique per node, sym fan-out = degree ≤ band-bucket cap)" +
        " with a node-keyed label attach (labels unique per node)."),
    FanoutSite("q200_canonical_policies", Seq("node"),
      "q167's composition plus the quality attach — every join is" +
        " node-keyed with the non-rank side unique per node (deg/labels/" +
        "quality are one row per node by their builds); sym fan-out" +
        " = degree ≤ band-bucket cap."),
    FanoutSite("q280_pbo_cscv", Seq("c"),
      "CSCV rank rollup: perf ⋈ chosenOos on the mask id c is a 1:1" +
        " attach (chosenOos is one argmax row per mask by its build —" +
        " materialized, so the uniqueness is declared here); volume =" +
        " |masks| · |universe| = 20 · |tickers|."),
    FanoutSite("q291_newey_west", Seq("mon"),
      "Bartlett lag products: the materialized γ series holds EXACTLY" +
        " one row per month (groupBy(mon) build), so each of the four" +
        " calendar-lag self-joins on mon = mon + l is 1:1 — ≤ |months|" +
        " rows per lag, dimension grain."),
    // ----- similarity / ANN model-state multipliers -------------------
    FanoutSite("q36_simhash", Seq("band", "bits"),
      "SimHash band buckets within a language block: per-(band, bits)" +
        " cells bounded by the band-bucket population (16-bit bands over" +
        " guarded docs); the Hamming verify runs per candidate pair."),
    FanoutSite("q38_embedding_neardup", Seq("label"),
      "label-blocked cosine pairs over normalized embeddings: the label" +
        " partitions the corpus into coarse cells (the IVF-style" +
        " blocking); candidate volume is Σ|cell|², verified per pair."),
    FanoutSite("q39_knn_brute", Seq(),
      "brute-force top-k BASELINE: broadcast query sample (constant-" +
        "sized) × corpus — the declared O(S·N) reference the LSH (q40)" +
        " and IVF (q56) variants beat; sample size is model state."),
    FanoutSite("q56_ivf_ann", Seq(),
      "IVF probe: query sample × broadcast codebook for nprobe cell" +
        " selection (k ≤ 64 centroids, model state), then candidates" +
        " confined to the probed cells."),
    FanoutSite("q98_kmeans", Seq(),
      "point × centroid assignment cross: k broadcast centroids (model" +
        " state, k ≤ 8); output is exactly n·k distance rows pruned to" +
        " the argmin — the Lloyd-iteration multiplier."),
    FanoutSite("q105_ivf_trained", Seq(),
      "vector × trained-codebook assignment cross: the k-means|| " +
        "codebook is broadcast model state (k×dim); output = |vectors|·k" +
        " distances pruned to argmin, invariant to corpus growth."),
    FanoutSite("q162_ann_recall", Seq(),
      "recall@k ground truth: brute-force over the BROADCAST query" +
        " sample only (constant rows) × corpus — the audit is" +
        " sample-bounded by design, never corpus × corpus."),
    FanoutSite("q204_pq_adc_search", Seq("m", "code"),
      "PQ-ADC: the LUT cross is query-sample × (M subquantizers × 256" +
        " codes) — codebook model state; the per-subvector code attach" +
        " then matches exactly one LUT row per (m, code) cell."),
    // ----- dedup / blocked candidate generation ------------------------
    FanoutSite("q114_incremental_dedup", Seq("band", "bval"),
      "delta×base LSH candidates: band-bucket equi join where only the" +
        " DELTA side posts probes; per-(band, bucket-value) cells are" +
        " bounded by the LSH band-bucket population of the base index."),
    FanoutSite("q191_allpairs_cosine", Seq("term"),
      "Bayardo all-pairs cosine: only PREFIX terms post candidates" +
        " (maximum-weight prefix bound), so per-term cells are df-capped" +
        " postings; the exact cosine verify runs per candidate pair."),
    FanoutSite("q96_fuzzy_editdist", Seq("hs"),
      "length-bucket + shingle blocked edit distance: per-(lang," +
        " length-bucket, shingle) candidate cells are df-capped; the" +
        " bounded levenshtein(…, 20) verify runs per candidate only."),
    FanoutSite("q210_image_phash_dedup", Seq("band", "bits"),
      "perceptual-hash band buckets: per-(band, bits) cells bounded by" +
        " the band-bucket population; bit_count Hamming verify per" +
        " candidate pair."),
    FanoutSite("q319_minhash_recall", Seq("hs"),
      "recall-audit ground truth: PREFIX-screened candidates (the q232" +
        " lemma — rarest n div 2 + 1 shingles per doc in global-df" +
        " order, exact for J ≥ 0.5) with the 1/8 salted-hash sample" +
        " filter on the probe side, so per-shingle cells are df-capped" +
        " by the prefix pruning theorem and sample-bounded besides —" +
        " never corpus² and never stop-shingle Σ df². The exact-Jaccard" +
        " verify runs per candidate; the LSH side is the shared q35" +
        " derived table with its own banded bounds."),
    FanoutSite("q320_retrieval_eval", Seq("term"),
      "self-supervised retrieval eval: the candidate join posts only" +
        " QUERY terms — each query contributes its 3 LOWEST-df tokens" +
        " (rank-limited pick), so a term's cell is |queries that chose" +
        " it| × df(term) with df at the rare tail by construction, and" +
        " the query side is a 1/16 salted-hash doc sample (the q162" +
        " audit-cost argument). Postings/df/doclen are the one corpus" +
        " index rollup, materialized once at scale."),
    FanoutSite("q205_hard_negatives", Seq("s"),
      "shingle-blocked hard-negative candidates: df-capped postings" +
        " cells (the q37 rare-gram discipline) — near-misses surface" +
        " only through shared shingles, never all-pairs."),
    FanoutSite("q226_wordpiece_encode", Seq("w"),
      "DISTINCT-word × vocab longest-match: cells keyed by word carry ≤" +
        " |word-length| piece candidates against the broadcast trained" +
        " vocab (model state); the corpus re-attaches by word equi-join."),
    FanoutSite("q228_fuzzy_linkage", Seq("bk"),
      "blocked record linkage: candidate pairs exist only within the" +
        " (soundex, key-prefix) block — per-block cells are name-key" +
        " bounded; the i<j residual halves each cell, and the customer" +
        " re-attach is by unique candidate key."),
    // ----- pair screens over dimensions --------------------------------
    FanoutSite("q174_source_overlap", Seq("s"),
      "source-pair shingle overlap: per-shingle cells emit ≤ |sources|²" +
        " pairs; sources are a catalog dimension (8 in the fixture," +
        " bounded by the ingest catalog at scale)."),
    FanoutSite("q276_stylometry_delta", Seq("w"),
      "Burrows delta source pairs over the top-20 function-word grid:" +
        " |sources|² pairs × 20 words — dimension × constant grain."),
    FanoutSite("q186_sketch_overlap", Seq("h"),
      "KMV type-pair intersection: |event types|² pair enumeration" +
        " (types are a small dimension) with shared-hash cells bounded" +
        " by the KMV sketch size K — sketch state, not event volume."),
    FanoutSite("q188_embedding_drift", Seq("label", "d"),
      "period×period centroid deltas per (label, dimension): ≤ |labels|" +
        " × dim cells of ≤ 2 period rows each — pure dimension grain."),
    // ----- grid / calendar / summary attaches --------------------------
    FanoutSite("q166_phrase_search", Seq("doc_id"),
      "positional phrase adjacency: term postings self-join per (doc," +
        " pos+1) — per-doc position lists bounded by the MaxDocChars" +
        " guard; the term equality prunes postings before the join."),
    FanoutSite("q170_modularity", Seq("j"),
      "edge-endpoint label attach: ≤ 1 label per node by the converged-" +
        "components invariant (q72 throws if unconverged); per-cell" +
        " volume = node degree, degree bounded by the LSH band cap."),
    FanoutSite("q173_stream_hll", Seq("bkt"),
      "HLL register-grid merge: (event_type, register) cells over the" +
        " 64-register × |types| × |days| grid — sketch state whose size" +
        " is fixed by the register count, not by event volume."),
    FanoutSite("q192_rolling_distinct", Seq("event_type"),
      "7-day calendar range join at REGISTER grain: per (type, day) the" +
        " window matches ≤ 7 day-rows × 64 registers — grid state; raw" +
        " events were rolled up before the range join."),
    FanoutSite("q196_association_rules", Seq("user_id"),
      "basket item pairs per user: items are distinct event TYPES (≤ 9" +
        " in the schema), so ≤ |types|² pairs per basket regardless of" +
        " per-user event volume — the dedup-first discipline."),
    FanoutSite("q219_triple_barrier", Seq("ticker", "frn"),
      "entry×path attach at daily-bar ROLLUP grain: each entry matches" +
        " ≤ horizon rows (the constant barrier window, via the frn" +
        " future-row-number equality); ticker cells are |days|-bounded."),
    FanoutSite("q234_conformal_intervals", Seq("event_type"),
      "per-type conformal calibration attach: the quantile frame holds" +
        " ≤ |types| × score-grid rows per cell — calibration state."),
    FanoutSite("q249_variance_ratio", Seq("ticker"),
      "q-period vs base variance attach per ticker at ROLLUP grain:" +
        " both sides are daily_bars rollups — ≤ |days| rows per cell."),
    FanoutSite("q89_funnel", Seq("user_id"),
      "funnel stage attach: each stage frame is first-event-per-user" +
        " (≤ 1 row per user per stage by the upstream min-ts dedup);" +
        " cells are stage-count bounded, not event-count bounded."),
    FanoutSite("q132_incremental_sessionize", Seq("user_id"),
      "chunk-boundary session merge at SUMMARY grain (chunkedUserScan):" +
        " ≤ |chunks| boundary rows per user cell by construction; the" +
        " 30-min proximity residual compares adjacent chunk summaries," +
        " never raw events (the hot-user replay proves the balance)."),
    // ----- declared cartesians (model-state / grid multipliers) --------
    FanoutSite("q149_naive_bayes_langid", Seq(),
      "token × per-language NB model cross: the model side is |langs| ×" +
        " vocab-cap likelihood state plus a ≤|langs|-row prior frame —" +
        " both broadcast model-state multipliers."),
    FanoutSite("q181_pit_snapshots", Seq(),
      "snapshot-date grid cross: weekly point-in-time dates (calendar" +
        " dimension) replicated against keyed history — ≤ |snapshot" +
        " dates| multiplier, restated per snapshot by design."),
    FanoutSite("q183_ab_readout", Seq(),
      "arm-summary cross: per-arm experiment statistics (≤ |arms| rows," +
        " grouped upstream) attached to the readout — the optimizer" +
        " cannot see the arm cardinality but the grouping key is the" +
        " 2-value assignment hash."),
    // (q264_skew_profiler's grid-cross declaration retired in r14: the
    // totals now derive from the materialized count-value domain, so no
    // hazard join remains in its plan.)
    FanoutSite("q296_cuped", Seq(),
      "pre/post period user-frame merge: both sides are per-user" +
        " aggregates (≤ 1 row per user per period), merged on a COALESCE" +
        " of the user keys (full-outer semantics) the attribute-name" +
        " extractor cannot name; the theta frame is a 1-row cross.")
  )

  /** Base-table scans statically UNIQUE on a column — primary keys of
    * the fixture tables (schema metadata a warehouse would carry as a
    * constraint). A join whose equi keys cover one of these on the
    * scan side matches ≤ 1 row per probe — the natural-key enrichment
    * shape, not a fan-out.
    */
  val uniqueScanKeys: Map[String, String] = Map(
    "orders.parquet" -> "o_orderkey",
    "part.parquet" -> "p_partkey",
    "supplier.parquet" -> "s_suppkey",
    "customer.parquet" -> "c_custkey",
    "nation.parquet" -> "n_nationkey",
    "region.parquet" -> "r_regionkey",
    "documents.parquet" -> "doc_id",
    "embeddings.parquet" -> "vec_id",
    "events.parquet" -> "event_id")

  private lazy val byQuery: Map[String, Seq[FanoutSite]] =
    declared.groupBy(_.query)

  def sitesFor(query: String): Seq[FanoutSite] =
    byQuery.getOrElse(query, Nil)

  def isDeclared(query: String): Boolean = byQuery.contains(query)
}
