package graft.operators

import graft.{QueryDef, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline (the 100 TB use case the
  * extension operators exist for): quality-filter → exact dedup →
  * MinHash near-dup removal → corpus stats, composed from the same
  * building blocks the standalone queries verify individually.
  *
  * Every stage is set-based: the quality filter is per-row map work, the
  * exact stage is one hash-groupBy, near-dup removal restricts the
  * LSH-verified pair set to survivors with semi-joins and drops the
  * higher doc_id of each pair (greedy-by-id — deterministic under
  * duplicate chains), and the final stats are one aggregation.
  */
object Curation extends QueryModule {

  // ---------------------------------------------------------------------
  // q61 — curation pipeline: per source, how many docs and tokens survive
  // each stage (emitted as survivors + drops per stage so the funnel is
  // visible and every number is oracle-checkable).
  // ---------------------------------------------------------------------
  private val q61 = QueryDef(
    "q61_curation_pipeline",
    (spark, dir) => {
      import spark.implicits._
      // stage 1: quality floor
      val quality = TextOps.withQuality(Tables.documents(spark, dir))
        .filter($"score" >= 0.6)
        .select($"doc_id", $"source", $"text", $"ws_tokens")
        .persist()
      // stage 2: exact dedup — keep the lowest doc_id per content hash
      val keepIds = quality.groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
      val exact = quality.join(keepIds, Seq("doc_id"), "left_semi").persist()
      // stage 3: near-dup removal — drop the higher id of every verified
      // pair whose BOTH endpoints survived the earlier stages
      val pairs = Dedup.nearDupPairs(spark, dir)
        .join(exact.select($"doc_id".as("i")), Seq("i"), "left_semi")
        .join(exact.select($"doc_id".as("j")), Seq("j"), "left_semi")
      val survivors = exact.join(
        pairs.select($"j".as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      survivors
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"ws_tokens").as("n_tokens"),
          min($"doc_id").as("min_doc_id"),
          max($"doc_id").as("max_doc_id"))
        .orderBy($"source")
    },
    Some(s"""
      WITH quality AS (${TextOps.qualitySql}),
      qfiltered AS (
        SELECT doc_id, source, text, ws_tokens FROM quality WHERE score >= 0.6),
      exact AS (
        SELECT * FROM qfiltered WHERE doc_id IN (
          SELECT min(doc_id) FROM qfiltered GROUP BY md5(text))),
      pairs AS (${Dedup.minhashOracle}),
      drops AS (
        SELECT DISTINCT p.j AS doc_id FROM pairs p
        WHERE p.i IN (SELECT doc_id FROM exact)
          AND p.j IN (SELECT doc_id FROM exact)),
      survivors AS (
        SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops))
      SELECT source, count(*) AS n_docs,
             CAST(sum(ws_tokens) AS BIGINT) AS n_tokens,
             min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      FROM survivors GROUP BY source ORDER BY source"""))

  // ---------------------------------------------------------------------
  // q64 — deterministic stratified downsampling: cap every source class at
  // ~TargetPerClass docs via a portable per-row hash test. keep iff
  // (h % 1e6) * n_class < target * 1e6 — pure integer arithmetic, so the
  // SAME rows are kept on any engine, any partitioning, any run; the class
  // sizes are a tiny broadcast-back aggregate (one pass + map-side filter,
  // no sort, no sample() nondeterminism).
  // ---------------------------------------------------------------------
  private val TargetPerClass = 120L
  private val q64 = QueryDef(
    "q64_stratified_sample",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val sizes = docs.groupBy($"source").agg(count(lit(1)).as("n_class"))
      docs.join(broadcast(sizes), Seq("source"))
        .filter(
          pmod(graft.functions.Portable.md5Hash64($"doc_id".cast("string")),
            lit(1000000L)) * $"n_class" < lit(TargetPerClass * 1000000L))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_sampled"),
          min($"doc_id").as("min_doc_id"),
          max($"doc_id").as("max_doc_id"),
          max($"n_class").as("n_class"))
        .orderBy($"source")
    },
    Some(s"""
      WITH sizes AS (
        SELECT source, count(*) AS n_class FROM documents GROUP BY source),
      kept AS (
        SELECT d.*, s.n_class
        FROM documents d JOIN sizes s USING (source)
        WHERE (${graft.functions.Portable.md5Hash64Sql("CAST(doc_id AS VARCHAR)")} % 1000000)
                * n_class < ${TargetPerClass} * 1000000)
      SELECT source, count(*) AS n_sampled,
             min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
             max(n_class) AS n_class
      FROM kept GROUP BY source ORDER BY source"""))

  override val defs: Seq[QueryDef] = Seq(q61, q64)
}
