package graft.plans

/** The SILVER-REUSE audit registry — the third declared-invariant
  * registry next to [[WindowBounds]] (window partition bounds) and
  * [[graft.operators.Silver]] (materialized derived tables).
  *
  * The hazard it closes (r9 verdict "Next round" #5, the q212 lesson
  * generalized): twelve silver tables amortize the heavy derived
  * frames, but nothing VERIFIED that a query didn't silently rebuild a
  * structurally-identical heavy subtree instead of consuming the
  * materialized table — at 100 TB that is a full fact-table scan +
  * aggregation repeated per query, invisible at fixture scale.
  * SharedSubtreeSpec walks the optimized plan of every SparkEntry query
  * and every Silver build, fingerprints each Aggregate subtree that
  * reads a base FACT table (canonicalized plan equality — the same
  * structural test Spark's ReuseExchange applies within one plan), and
  * fails when the same canonical subtree is planned by two or more
  * independent top-level builds. A hit means: promote the subtree to a
  * Silver table, or declare here WHY rebuilding is the right call.
  *
  * Signatures are `[sorted group keys] @ fact-tables`. Coarser than the
  * canonical fingerprint (several structurally-distinct aggregates can
  * share one signature) — deliberate: the allowlist is a human-reviewed
  * contract, and the reviewer reasons about "who re-aggregates this
  * fact at this grain", not about expression-tree identity.
  */
object SharedSubtrees {

  /** signature -> why the rebuild is accepted instead of a silver
    * promotion. Empty-reason entries fail registry hygiene.
    */
  val allowed: Map[String, String] = Map(
    "[] @ events" ->
      ("single-row global bounds (min/max day span, census counts) over" +
        " the events fact: the scan is shared with the query's own main" +
        " pass in-plan (ReuseExchange) or is the query's only pass;" +
        " materializing a 1-row frame as a silver table would add a" +
        " write-read round-trip per consumer for no scan saved"),
    "[] @ documents" ->
      ("single-row global rollups (corpus token totals, doc counts) —" +
        " same reasoning as the events bounds row"),
    "[] @ lineitem" ->
      ("single-row global rollups (tape totals) — same reasoning as the" +
        " events bounds row"),
    "[event_type] @ events" ->
      ("the sketch queries' exact-distinct AUDIT ride-along (q133 KMV" +
        " re-aggregation, q161 HLL registers both carry countDistinct(h)" +
        " per type so sketch error is visible next to truth): the exact" +
        " column exists only to audit the sketch at fixture scale and is" +
        " dropped at 100 TB (documented at both sites) — materializing" +
        " the audit apparatus as a silver table would enshrine the very" +
        " pass the sketches exist to avoid"),
    "[shard] @ documents" ->
      ("the WebDataset exporters' packing reshuffle (q121 text shards," +
        " q216 multimodal shards both collect each shard's member list):" +
        " this aggregate is a full-corpus repartition carrying the text" +
        " payload, not a derived computation — materializing it as silver" +
        " would double-store the corpus for no scan saved; each export" +
        " format re-reads and re-shuffles the corpus exactly once either" +
        " way")
  )
}
