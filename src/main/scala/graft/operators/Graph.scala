package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the verified near-dup pair graph —
  * the operator family q151 (triangle count) and q72 (connected
  * components) open: PageRank-style link analysis, the centrality score
  * a dedup/curation pipeline uses to pick the CANONICAL document of a
  * duplicate cluster (keep the most-linked representative, drop the
  * rest) and a search layer uses as a static rank signal.
  *
  * Scale stance (100 TB): the rank vector is a DataFrame keyed by node —
  * it is NEVER collected to the driver and never broadcast (contrast the
  * naive "ranks in a driver map" formulation, which caps at driver
  * memory). Each iteration is (a) one node-key join of ranks to
  * out-degrees — both sides already partitioned by node from the
  * previous round's rollup, (b) one edge-key shuffle of per-node
  * contributions to edge destinations, (c) one dst rollup whose integer
  * partial sums combine map-side. Cost per round is O(|E|) shuffle
  * bytes, rounds are a fixed constant — the standard Pregel-class
  * envelope, expressed in plain DataFrame ops so Catalyst/AQE handle
  * skew and partition sizing.
  *
  * Determinism: ranks are exact integer micro-mass (10^6 per node seed).
  * The damping update r' = 0.15·10^6 + 0.85·Σ(r div deg) is computed as
  * `150000 + (17·s) div 20` — every operand non-negative, so Spark's
  * truncating `div` and DuckDB's flooring `//` agree (q148's sign
  * discipline), and integer sums are partition-order invariant. Mass is
  * deliberately NOT renormalized between rounds: truncation leaks ≤ 1
  * unit per (node, round), bounded and reproducible, and the jackknife
  * of exactness beats a cosmetically-conserved float total (q152's
  * ordered-reduce lesson).
  *
  * Reference anchor: the reference keeps one row per (subreddit, symbol)
  * mention stream and has no graph layer — this is the brief's
  * "training-data pipeline at scale" extension, companion to q151.
  */
object Graph extends QueryModule {

  private val Rounds = 3
  private val SeedMass = 1000000L

  /** One PageRank round: ranks (node, r) → next ranks, over symmetric
    * edges (src, dst) and per-node degrees (node, degree).
    */
  private def prRound(r: DataFrame, deg: DataFrame, sym: DataFrame): DataFrame = {
    // every round re-joins frames sharing the edge-table lineage — fresh
    // column aliases (new exprIds) keep the self-join unambiguous
    val d = deg.select(col("node").as("dnode"), col("degree").as("ddeg"))
    val e = sym.select(col("src").as("esrc"), col("dst").as("edst"))
    r.join(d, col("node") === col("dnode"))
      .withColumn("c", expr("r div ddeg"))
      .join(e, col("node") === col("esrc"))
      .groupBy(col("edst"))
      .agg(sum(col("c")).as("s"))
      .select(col("edst").as("node"),
        (lit(150000L) + expr("(17 * s) div 20")).as("r"))
  }

  // ---------------------------------------------------------------------
  // q160 — fixed-round integer PageRank on the near-dup graph. The
  // undirected pair set is symmetrized (both directions), so every node
  // in the graph has out-degree ≥ 1 — no dangling-mass term — and the
  // per-round recurrence is exactly:
  //   r₀(v)   = 10^6
  //   rₜ₊₁(v) = 150000 + (17 · Σ_{u→v} (rₜ(u) div deg(u))) div 20
  // Output: per node, its degree and the round-3 rank — the (canonical-
  // doc-selection, static-rank) pair. Isolated docs (no verified near-dup
  // edge) are out of scope by construction, as in q151.
  // ---------------------------------------------------------------------
  /** Unordered (node, degree, pr2, pr3) PageRank table over the near-dup
    * graph — q160's body, reusable by composing operators (q167's
    * canonical-doc selection). Carries the LAST TWO rounds so consumers
    * can read the convergence residual Σ|pr3 − pr2| (r11 verdict #2);
    * the round-2 subtree is shared with round 3's lineage and reused via
    * exchange reuse, not recomputed.
    */
  private[operators] def pageRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = Dedup.nearDupPairs(spark, dir).select($"i", $"j").distinct()
    // r14 (guide §2.4): sym feeds every unrolled round's edge join and
    // deg; deg feeds every round + the final projection — as lineage
    // copies the pair-table scan + distinct re-planned ~8× (210
    // Exchanges in q160's before-plan). Materialize the edge-scale sym
    // and node-scale deg once; each round then plans two FileScans.
    val sym = Scoped.materialize()(
      edges.select($"i".as("src"), $"j".as("dst"))
        .unionAll(edges.select($"j".as("src"), $"i".as("dst"))))
    val deg = Scoped.materialize()(sym.groupBy($"src".as("node"))
      .agg(count(lit(1)).as("degree")))
    val r0 = deg.select($"node", lit(SeedMass).as("r"))
    val r2 = (1 until Rounds).foldLeft(r0)((r, _) => prRound(r, deg, sym))
    val r3 = prRound(r2, deg, sym)
    deg.join(r3.withColumnRenamed("r", "pr3"), Seq("node"))
      .join(r2.withColumnRenamed("r", "pr2"), Seq("node"))
      .select($"node", $"degree", $"pr2", $"pr3")
  }

  /** q160's rank-recurrence CTE chain (everything after `pairs`),
    * shared verbatim with q167's oracle.
    */
  private[operators] def pageRankCtes: String = {
    def roundSql(prev: String, cur: String): String = s"""
      s_$cur AS (
        SELECT e.dst AS node, sum(r.r // d.degree) AS s
        FROM r_$prev r
        JOIN deg d ON d.node = r.node
        JOIN sym e ON e.src = r.node
        GROUP BY 1),
      r_$cur AS (
        SELECT node, CAST(150000 + (17 * s) // 20 AS BIGINT) AS r
        FROM s_$cur)"""
    s"""
      edges AS (SELECT DISTINCT i, j FROM pairs),
      sym AS (
        SELECT i AS src, j AS dst FROM edges
        UNION ALL
        SELECT j AS src, i AS dst FROM edges),
      deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY 1),
      r_0 AS (SELECT node, CAST($SeedMass AS BIGINT) AS r FROM deg),
      ${(1 to Rounds).map(t => roundSql((t - 1).toString, t.toString)).mkString(",")}"""
  }

  private val q160 = QueryDef(
    "q160_pagerank",
    (spark, dir) => {
      import spark.implicits._
      val pr = pageRank(spark, dir)
      // convergence residual: total rank mass still moving in the final
      // round — the hash gate pins "how converged" at each SF (exact
      // BIGINT; the fixed-round result stays well-defined either way)
      val delta = pr.agg(sum(abs($"pr3" - $"pr2")).as("rank_delta_sum"))
      pr.crossJoin(broadcast(delta))
        .select($"node", $"degree", $"pr3", $"rank_delta_sum")
        .orderBy($"node")
    },
    Some(s"""
      WITH pairs AS (${Dedup.minhashOracle}),
      $pageRankCtes,
      pr AS (
        SELECT d.node, d.degree, r2.r AS pr2, r3.r AS pr3
        FROM deg d
        JOIN r_$Rounds r3 ON r3.node = d.node
        JOIN r_${Rounds - 1} r2 ON r2.node = d.node),
      delta AS (
        SELECT CAST(sum(abs(pr3 - pr2)) AS BIGINT) AS rank_delta_sum
        FROM pr)
      SELECT pr.node, pr.degree, pr.pr3, delta.rank_delta_sum
      FROM pr, delta
      ORDER BY pr.node"""))

  // ---------------------------------------------------------------------
  // q167 — CANONICAL-DOC SELECTION: the operator the whole graph family
  // exists to feed. Near-dup clusters (q72's connected components) keep
  // exactly one representative; picking it by doc_id (q61's greedy) is
  // arbitrary — picking the cluster's PAGERANK argmax keeps the most
  // central copy, the version other documents duplicate FROM (SemDeDup /
  // web-curation practice: keep the canonical origin, drop mirrors).
  // Composition is two node-keyed joins over q72's labels and q160's
  // ranks — both already distributed tables, no new shuffle class; the
  // per-cluster argmax is a max_by AGGREGATION, deliberately not a
  // row_number window: the aggregate combines map-side and holds one
  // candidate per cluster, so even a pathological giant cluster (one
  // boilerplate page mirrored across the crawl) never buffers in a
  // single task. Deterministic: ties on (pr3 desc, node asc) via the
  // (pr3, -node) max key — node is unique, so no residual tie exists.
  // The oracle nests BOTH parents' CTE chains off one shared pair table,
  // so this green row re-proves components and PageRank agree on the
  // same graph.
  // ---------------------------------------------------------------------
  private val q167 = QueryDef(
    "q167_canonical_docs",
    (spark, dir) => {
      import spark.implicits._
      val labels = Dedup.clusterLabels(spark, dir) // (node, label)
      val pr = pageRank(spark, dir)
      labels.join(pr, Seq("node"))
        .groupBy($"label")
        .agg(
          count(lit(1)).as("cluster_size"),
          max_by(struct($"node", $"pr3"), struct($"pr3", -$"node")).as("c"))
        .select($"label".as("cluster_id"), $"cluster_size",
          $"c.node".as("canonical_doc"), $"c.pr3".as("canonical_pr3"))
        .orderBy($"cluster_id")
    },
    Some(s"""
      WITH RECURSIVE pairs AS (${Dedup.minhashOracle}),
      cedges AS (SELECT i, j FROM pairs UNION SELECT j AS i, i AS j FROM pairs),
      cnodes AS (SELECT DISTINCT i AS node FROM cedges),
      reach(a, b) AS (
        SELECT node, node FROM cnodes
        UNION
        SELECT r.a, e.j FROM reach r JOIN cedges e ON e.i = r.b),
      labeled AS (SELECT a AS node, min(b) AS label FROM reach GROUP BY a),
      $pageRankCtes,
      joined AS (
        SELECT l.label, l.node, r.r AS pr3,
               row_number() OVER (
                 PARTITION BY l.label ORDER BY r.r DESC, l.node ASC) AS rn,
               count(*) OVER (PARTITION BY l.label) AS cluster_size
        FROM labeled l JOIN r_$Rounds r ON r.node = l.node)
      SELECT label AS cluster_id,
             CAST(cluster_size AS BIGINT) AS cluster_size,
             node AS canonical_doc, pr3 AS canonical_pr3
      FROM joined WHERE rn = 1 ORDER BY cluster_id"""))

  // ---------------------------------------------------------------------
  // q170 — CLUSTERING MODULARITY AUDIT: is the q72 partition actually a
  // community structure, or an artifact? Newman modularity
  // Q = Σ_c [e_c/m − (d_c/2m)²] scored EXACTLY: with common denominator
  // 4m², each cluster's contribution is the integer 4·m·e_c − d_c², so
  // the per-cluster rows (and their sum) carry no float accumulation at
  // all — one final division turns the total into the familiar [−½, 1]
  // score. This is the audit number a dedup pipeline checks before
  // trusting cluster-level decisions (canonical selection q167, cluster
  // caps): Q near 0 means the "clusters" are noise.
  //
  // Scale: e_c is one join of the (i<j) edge list to labels on both
  // endpoints + a label rollup; d_c is the degree table (already built
  // for q160) joined to labels + a rollup — all node/edge-keyed
  // shuffles on tables that exist anyway; m is a 1-row broadcast.
  // Envelope: |labels| + |edges|, same class as one PageRank round.
  // ---------------------------------------------------------------------
  private val q170 = QueryDef(
    "q170_modularity",
    (spark, dir) => {
      import spark.implicits._
      val edges = Dedup.nearDupPairs(spark, dir).select($"i", $"j").distinct()
      val labels = Dedup.clusterLabels(spark, dir) // (node, label)
      val m = edges.agg(count(lit(1)).as("m"))
      val intra = edges
        .join(labels.select($"node".as("i"), $"label".as("l_i")), Seq("i"))
        .join(labels.select($"node".as("j"), $"label".as("l_j")), Seq("j"))
        .filter($"l_i" === $"l_j")
        .groupBy($"l_i".as("label")).agg(count(lit(1)).as("e_intra"))
      val degSum = edges
        .select(explode(array($"i", $"j")).as("node"))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
        .join(labels, Seq("node"))
        .groupBy($"label").agg(sum($"deg").as("d_sum"), count(lit(1)).as("n_nodes"))
      degSum.join(intra, Seq("label"), "left")
        .na.fill(0L, Seq("e_intra"))
        .crossJoin(broadcast(m))
        .select($"label".as("cluster_id"), $"n_nodes", $"e_intra", $"d_sum",
          (lit(4L) * $"m" * $"e_intra" - $"d_sum" * $"d_sum")
            .as("q_contrib_4m2"),
          $"m")
        .orderBy($"cluster_id")
    },
    Some(s"""
      WITH RECURSIVE pairs AS (${Dedup.minhashOracle}),
      edges AS (SELECT DISTINCT i, j FROM pairs),
      cedges AS (SELECT i, j FROM edges UNION SELECT j AS i, i AS j FROM edges),
      cnodes AS (SELECT DISTINCT i AS node FROM cedges),
      reach(a, b) AS (
        SELECT node, node FROM cnodes
        UNION
        SELECT r.a, e.j FROM reach r JOIN cedges e ON e.i = r.b),
      labeled AS (SELECT a AS node, min(b) AS label FROM reach GROUP BY a),
      mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
      intra AS (
        SELECT li.label, CAST(count(*) AS BIGINT) AS e_intra
        FROM edges e
        JOIN labeled li ON li.node = e.i
        JOIN labeled lj ON lj.node = e.j
        WHERE li.label = lj.label
        GROUP BY 1),
      degsum AS (
        SELECT l.label, CAST(sum(d.deg) AS BIGINT) AS d_sum,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM (
          SELECT node, count(*) AS deg
          FROM (SELECT unnest([i, j]) AS node FROM edges) GROUP BY 1) d
        JOIN labeled l ON l.node = d.node
        GROUP BY 1)
      SELECT ds.label AS cluster_id, ds.n_nodes,
             COALESCE(i.e_intra, 0) AS e_intra, ds.d_sum,
             CAST(4 * mm.m * COALESCE(i.e_intra, 0) - ds.d_sum * ds.d_sum
               AS BIGINT) AS q_contrib_4m2,
             mm.m
      FROM degsum ds LEFT JOIN intra i ON i.label = ds.label
      CROSS JOIN mm
      ORDER BY cluster_id"""))

  // ---------------------------------------------------------------------
  // q201 — SIMILARITY-WEIGHTED PageRank: q160 treats every near-dup
  // edge equally; here mass flows in proportion to the verified
  // Jaccard, so a node duplicated at 0.9 pulls harder than one at 0.5 —
  // the centrality that actually reflects duplication strength, and the
  // rank most canonical-selection policies want under the hood. Edge
  // weights are milli-Jaccard integers (floor(1000·j) of the
  // hash-verified double — identical on both engines because the double
  // itself is); the recurrence divides each node's outflow by its
  // weighted degree, all operands non-negative, so the integer
  // discipline of q160 carries over unchanged: r' = 150000 +
  // (17·Σ (r·w_uv div W_u)) div 20. A single-edge pair is still an
  // exact fixed point ((r·w) div w = r), which the spec pins. Same
  // Pregel-class envelope: one node join + one edge shuffle per round.
  // ---------------------------------------------------------------------
  private val q201 = QueryDef(
    "q201_weighted_pagerank",
    (spark, dir) => {
      import spark.implicits._
      val edges = Dedup.nearDupPairs(spark, dir)
        .select($"i", $"j",
          floor($"jaccard" * 1000).cast("long").as("w"))
        .distinct()
      // r14: same treatment as pageRank — materialize the edge-scale
      // wsym and node-scale wdeg once instead of re-planning the pair
      // scan through every unrolled round (210 Exchanges before).
      val sym = Scoped.materialize()(
        edges.select($"i".as("src"), $"j".as("dst"), $"w")
          .unionAll(edges.select($"j".as("src"), $"i".as("dst"), $"w")))
      val wdeg = Scoped.materialize()(sym.groupBy($"src".as("node"))
        .agg(sum($"w").as("wdeg"), count(lit(1)).as("degree")))
      val r0 = wdeg.select($"node", lit(SeedMass).as("r"))
      def round(r: DataFrame): DataFrame = {
        val d = wdeg.select(col("node").as("dnode"), col("wdeg").as("dw"))
        val e = sym.select(col("src").as("esrc"), col("dst").as("edst"),
          col("w").as("ew"))
        r.join(d, col("node") === col("dnode"))
          .join(e, col("node") === col("esrc"))
          .withColumn("c", expr("(r * ew) div dw"))
          .groupBy(col("edst"))
          .agg(sum(col("c")).as("s"))
          .select(col("edst").as("node"),
            (lit(150000L) + expr("(17 * s) div 20")).as("r"))
      }
      val r2 = (1 until Rounds).foldLeft(r0)((r, _) => round(r))
      val r3 = round(r2)
      val pr = wdeg.join(r3.withColumnRenamed("r", "wpr3"), Seq("node"))
        .join(r2.withColumnRenamed("r", "wpr2"), Seq("node"))
      // convergence residual (the q160 discipline): exact total rank
      // movement in the final round, pinned per-SF by the hash gate
      val delta = pr.agg(sum(abs($"wpr3" - $"wpr2")).as("rank_delta_sum"))
      pr.crossJoin(broadcast(delta))
        .select($"node", $"degree", $"wdeg", $"wpr3", $"rank_delta_sum")
        .orderBy($"node")
    },
    Some {
      def roundSql(prev: String, cur: String): String = s"""
      ws_$cur AS (
        SELECT e.dst AS node, sum((r.r * e.w) // d.wdeg) AS s
        FROM wr_$prev r
        JOIN wdeg d ON d.node = r.node
        JOIN wsym e ON e.src = r.node
        GROUP BY 1),
      wr_$cur AS (
        SELECT node, CAST(150000 + (17 * s) // 20 AS BIGINT) AS r
        FROM ws_$cur)"""
      s"""
      WITH pairs AS (${Dedup.minhashOracle}),
      wedges AS (
        SELECT DISTINCT i, j, CAST(floor(jaccard * 1000) AS BIGINT) AS w
        FROM pairs),
      wsym AS (
        SELECT i AS src, j AS dst, w FROM wedges
        UNION ALL
        SELECT j AS src, i AS dst, w FROM wedges),
      wdeg AS (
        SELECT src AS node, CAST(sum(w) AS BIGINT) AS wdeg,
               CAST(count(*) AS BIGINT) AS degree
        FROM wsym GROUP BY 1),
      wr_0 AS (SELECT node, CAST($SeedMass AS BIGINT) AS r FROM wdeg),
      ${(1 to Rounds).map(t => roundSql((t - 1).toString, t.toString)).mkString(",")},
      wpr AS (
        SELECT d.node, d.degree, d.wdeg, r3.r AS wpr3, r2.r AS wpr2
        FROM wdeg d
        JOIN wr_$Rounds r3 ON r3.node = d.node
        JOIN wr_${Rounds - 1} r2 ON r2.node = d.node),
      wdelta AS (
        SELECT CAST(sum(abs(wpr3 - wpr2)) AS BIGINT) AS rank_delta_sum
        FROM wpr)
      SELECT wpr.node, wpr.degree, wpr.wdeg, wpr.wpr3, wdelta.rank_delta_sum
      FROM wpr, wdelta
      ORDER BY wpr.node"""
    })

  // ---------------------------------------------------------------------
  // q286 — K-CORE DECOMPOSITION (Seidman 1983; Batagelj–Zaveršnik peel):
  // the k-core is the maximal subgraph where every node keeps degree ≥ k
  // — the density ladder a dedup/curation pipeline reads to separate
  // tree-like incidental duplication (coreness 1) from mutually-
  // interlinked boilerplate families (coreness ≥ 2, cycles) and dense
  // mirror farms (coreness ≥ 3). Peeling is the standard algorithm:
  // repeatedly drop nodes whose remaining degree < k; here as a FIXED
  // 8-round synchronous peel per k (both engines run the identical
  // rounds, so the result is well-defined and hash-comparable whether or
  // not the peel has converged; SketchGraphSpec peels to the true
  // fixpoint on the driver and asserts agreement), with the 3-core peeled FROM
  // the 2-core (k-cores nest), so coreness = 1 + [in 2-core] +
  // [in 3-core] caps at 3.
  //
  // Scale: each round is one alive-semijoin of the symmetric edge list +
  // one map-combinable degree rollup — O(|E|) shuffle bytes per round,
  // the q160 Pregel-class envelope. Lineage is truncated per round
  // (q72's rewrap discipline: each round's plan references the previous
  // alive set twice, so carrying Catalyst lineage across 16 rounds would
  // grow the plan 2^16-fold); the per-round count() that materializes
  // the rewrap is a 1-scalar driver action (the P12 bounded-collect
  // convention — on a cluster this is the iterate-then-checkpoint loop).
  // Everything is exact integer counts; no floats anywhere.
  // ---------------------------------------------------------------------
  private val PeelRounds = 8

  /** Fixed-round synchronous peel: nodes of `start` surviving
    * `PeelRounds` rounds of "drop if degree within the alive set < k",
    * over symmetric edges (src, dst). Also returns the FINAL round's
    * alive-set drop — the convergence residual (the peel is monotone, so
    * a zero-drop round is a fixpoint: unchanged alive set ⇒ unchanged
    * in-set degrees ⇒ every later round drops nothing). Emitting it in
    * the query output makes the hash gate itself pin "converged at this
    * SF" (r11 verdict #2) instead of leaving convergence to a spec-scale
    * audit only. The counts reuse the per-round materialization actions
    * the rewrap loop already pays — no extra job.
    */
  private def peel(sym: DataFrame, start: DataFrame, k: Int): (DataFrame, Long) = {
    val spark = sym.sparkSession
    import spark.implicits._
    def rewrap(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema).persist()
    var alive = rewrap(start.select($"node"))
    var prevCount = alive.count()
    var lastDrop = 0L
    // early exit on fixpoint (r13 optimization): the peel is MONOTONE —
    // a round that drops nothing leaves the alive set unchanged, so every
    // remaining round also drops nothing and lastDrop ends at 0. Stopping
    // there returns the identical (alive, 0) pair while skipping the dead
    // rounds' join+count jobs; the oracle still runs all PeelRounds CTE
    // rounds and agrees by the same argument (ConvergenceSpec holds the
    // fixpoint proof at both fixture SFs).
    var round = 0
    var fixed = false
    while (round < PeelRounds && !fixed) {
      round += 1
      val a1 = alive.select($"node".as("asrc"))
      val a2 = alive.select($"node".as("adst"))
      val next = rewrap(sym
        .join(a1, col("src") === col("asrc"))
        .join(a2, col("dst") === col("adst"))
        .groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("node")))
      val c = next.count()
      lastDrop = prevCount - c
      fixed = lastDrop == 0L
      prevCount = c
      alive.unpersist()
      alive = next
    }
    (alive, lastDrop)
  }

  /** The peel's oracle twin: `PeelRounds` chained CTEs from `start`
    * (a CTE name holding one `node` column) peeling at `k`, emitting
    * CTEs named `${pfx}_1 .. ${pfx}_$PeelRounds`. Every round is
    * MATERIALIZED: each references its predecessor twice, so DuckDB's
    * default CTE inlining would expand the chain 2^rounds-fold
    * (exhausting parquet file handles through the re-inlined pair
    * pipeline) — the oracle-side analog of the Spark builder's rewrap.
    */
  private def peelSql(pfx: String, start: String, k: Int): String =
    (1 to PeelRounds).map { t =>
      val prev = if (t == 1) start else s"${pfx}_${t - 1}"
      s"""
      ${pfx}_$t AS MATERIALIZED (
        SELECT s.src AS node FROM sym s
        JOIN $prev p1 ON p1.node = s.src
        JOIN $prev p2 ON p2.node = s.dst
        GROUP BY s.src HAVING count(*) >= $k)"""
    }.mkString(",")

  private val q286 = QueryDef(
    "q286_kcore",
    (spark, dir) => {
      import spark.implicits._
      val edges = Dedup.nearDupPairs(spark, dir).select($"i", $"j").distinct()
      val sym = edges.select($"i".as("src"), $"j".as("dst"))
        .unionAll(edges.select($"j".as("src"), $"i".as("dst")))
      val deg = sym.groupBy($"src".as("node"))
        .agg(count(lit(1)).as("degree"))
      val (core2, drop2) = peel(sym, deg.select($"node"), 2)
      val (core3, drop3) = peel(sym, core2, 3)
      // each peel's FINAL alive frame is still persisted (intermediate
      // rounds release inside the loop) — close the scope through the
      // materialize boundary, the connectedComponents discipline
      Scoped.materialize(core2, core3)(deg
        .join(core2.select($"node", lit(1L).as("in2")), Seq("node"), "left")
        .join(core3.select($"node", lit(1L).as("in3")), Seq("node"), "left")
        .na.fill(0L, Seq("in2", "in3"))
        .select($"node", $"degree",
          (lit(1L) + $"in2" + $"in3").as("coreness"),
          // convergence residuals: nodes dropped in each peel's FINAL
          // round — 0 ⇔ that peel reached its fixpoint at this SF (the
          // hash gate pins the value per scale factor)
          lit(drop2).as("peel2_residual"),
          lit(drop3).as("peel3_residual")))
        .orderBy($"node")
    },
    Some(s"""
      WITH pairs AS MATERIALIZED (${Dedup.minhashOracle}),
      edges AS MATERIALIZED (SELECT DISTINCT i, j FROM pairs),
      sym AS MATERIALIZED (
        SELECT i AS src, j AS dst FROM edges
        UNION ALL
        SELECT j AS src, i AS dst FROM edges),
      deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY 1),
      ${peelSql("c2", "deg", 2)},
      ${peelSql("c3", s"c2_$PeelRounds", 3)}
      SELECT d.node, d.degree,
             CAST(1 + (CASE WHEN k2.node IS NULL THEN 0 ELSE 1 END)
                    + (CASE WHEN k3.node IS NULL THEN 0 ELSE 1 END)
               AS BIGINT) AS coreness,
             CAST((SELECT count(*) FROM c2_${PeelRounds - 1})
                - (SELECT count(*) FROM c2_$PeelRounds)
               AS BIGINT) AS peel2_residual,
             CAST((SELECT count(*) FROM c3_${PeelRounds - 1})
                - (SELECT count(*) FROM c3_$PeelRounds)
               AS BIGINT) AS peel3_residual
      FROM deg d
      LEFT JOIN c2_$PeelRounds k2 ON k2.node = d.node
      LEFT JOIN c3_$PeelRounds k3 ON k3.node = d.node
      ORDER BY d.node"""))

  // ---------------------------------------------------------------------
  // q287 — LINK PREDICTION over the part CO-PURCHASE graph (Liben-Nowell
  // & Kleinberg 2003): nodes are parts, edges connect parts co-occurring
  // in ≥ 2 distinct orders (the repeat-co-occurrence floor drops
  // single-basket noise and bounds wedge volume), and NON-edges at
  // distance 2 are scored by common-neighbor count, neighborhood
  // Jaccard, and an Adamic–Adar surrogate — the "customers who bought
  // these also bought" recommendation shape, which over a document
  // graph ranks re-verification candidates for q114's incremental
  // dedup. (The near-dup graph itself is the WRONG substrate here:
  // band-bucket clusters are cliques, so every wedge closes and the
  // candidate set is empty by construction.)
  //
  // Adamic–Adar Σ 1/ln(deg(w)) needs a transcendental — the house
  // bitlen surrogate Σ 1000 div bitlen(deg(w)) keeps the 1/log shape
  // in exact integers (q120's ⌊log₂⌋ identity; documented divergence
  // from the paper's ln, same ordering behavior: hub centers count
  // less). Jaccard over neighbor sets is exact: 1000·cn div
  // (deg_a + deg_b − cn), all counts.
  //
  // Scale: the edge build is one order-key self-join (baskets are
  // small, so per-order pair fan-out is C(k,2) with tiny k) + a
  // map-combinable pair rollup; wedge enumeration is the q151 triangle
  // join — Σ deg(w)² candidate rows off the symmetric edge list (the
  // cnt ≥ 2 floor keeps degrees band-bucket sized; at web scale the
  // standard super-hub cap on wedge centers bounds the square —
  // documented). Output is the global top-100 by (cn, aa, pair) —
  // TakeOrdered.
  // ---------------------------------------------------------------------
  private val LinkTopK = 100
  private val MinCooc = 2L

  private val q287 = QueryDef(
    "q287_link_predict",
    (spark, dir) => {
      import spark.implicits._
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      // r14 (guide §2.4): `edges` (the lineitem self-join + pair rollup)
      // fed sym ×2, the anti-join and — through sym — both wedge legs
      // and deg: ~7 lineage copies, each re-executing the self-join
      // (the before-plan repeats the subtree ten times). Materialize
      // edges and the |nodes|-row deg table once; the oracle already
      // declares both MATERIALIZED.
      val edges = Scoped.materialize()(li.select($"ok", $"pk".as("i"))
        .join(li.select($"ok".as("ok2"), $"pk".as("j")),
          $"ok" === $"ok2" && $"i" < $"j")
        .groupBy($"i", $"j")
        .agg(count(lit(1)).as("cooc"))
        .filter($"cooc" >= MinCooc)
        .select($"i", $"j"))
      val sym = edges.select($"i".as("src"), $"j".as("dst"))
        .unionAll(edges.select($"j".as("src"), $"i".as("dst")))
      val deg = Scoped.materialize()(sym.groupBy($"src".as("node"))
        .agg(count(lit(1)).as("degree")))
      val e1 = sym.select($"src".as("w"), $"dst".as("a"))
      val e2 = sym.select($"src".as("w2"), $"dst".as("b"))
      val wedges = e1.join(e2, $"w" === $"w2" && $"a" < $"b")
        .select($"a", $"b", $"w")
      val nonEdge = wedges.join(edges,
          wedges("a") === edges("i") && wedges("b") === edges("j"),
          "left_anti")
      val scored = nonEdge
        .join(deg.select($"node".as("w"), $"degree".as("dw")), Seq("w"))
        .groupBy($"a", $"b")
        .agg(count(lit(1)).as("cn"),
          sum(expr("1000 div length(conv(dw, 10, 2))")).as("aa_milli"))
      scored
        .join(deg.select($"node".as("a"), $"degree".as("deg_a")), Seq("a"))
        .join(deg.select($"node".as("b"), $"degree".as("deg_b")), Seq("b"))
        .withColumn("jaccard_milli",
          expr("(1000 * cn) div (deg_a + deg_b - cn)"))
        .select($"a", $"b", $"cn", $"deg_a", $"deg_b",
          $"jaccard_milli", $"aa_milli")
        .orderBy($"cn".desc, $"aa_milli".desc, $"a", $"b")
        .limit(LinkTopK)
    },
    Some(s"""
      WITH edges AS MATERIALIZED (
        SELECT a.l_partkey AS i, b.l_partkey AS j
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= $MinCooc),
      sym AS MATERIALIZED (
        SELECT i AS src, j AS dst FROM edges
        UNION ALL
        SELECT j AS src, i AS dst FROM edges),
      deg AS MATERIALIZED (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY 1),
      wedges AS (
        SELECT e1.dst AS a, e2.dst AS b, e1.src AS w
        FROM sym e1 JOIN sym e2
          ON e1.src = e2.src AND e1.dst < e2.dst),
      nonedge AS (
        SELECT wg.a, wg.b, wg.w FROM wedges wg
        WHERE NOT EXISTS (
          SELECT 1 FROM edges e WHERE e.i = wg.a AND e.j = wg.b)),
      scored AS (
        SELECT ne.a, ne.b, CAST(count(*) AS BIGINT) AS cn,
               CAST(sum(1000 // length(format('{:b}', d.degree)))
                 AS BIGINT) AS aa_milli
        FROM nonedge ne JOIN deg d ON d.node = ne.w
        GROUP BY 1, 2)
      SELECT s.a, s.b, s.cn, da.degree AS deg_a, db.degree AS deg_b,
             (1000 * s.cn) // (da.degree + db.degree - s.cn)
               AS jaccard_milli,
             s.aa_milli
      FROM scored s
      JOIN deg da ON da.node = s.a
      JOIN deg db ON db.node = s.b
      ORDER BY s.cn DESC, s.aa_milli DESC, s.a, s.b
      LIMIT $LinkTopK"""))

  override val defs: Seq[QueryDef] = Seq(q160, q167, q170, q201, q286, q287)
}
