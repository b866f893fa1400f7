package graft.operators

import graft.{QueryDef, QueryModule}
import graft.functions.{FreqSketchAgg, Portable}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Corpus search / frequency operators over the documents table — the
  * retrieval side of a training-data pipeline (keyword relevance ranking
  * for corpus inspection; heavy-hitter token stats for vocabulary and
  * contamination audits).
  *
  * Scale notes: q84 never shuffles the corpus — the postings are filtered
  * to the query terms at the scan (predicate on the exploded term), the
  * df/N sides are tiny broadcast aggregates, and the final top-k is a
  * TakeOrderedAndProject. q85 is the two-pass sketch-then-verify shape:
  * pass 1 is a bounded Misra–Gries aggregate (k entries per partition on
  * the shuffle, never the token dictionary — the dictionary of a 100 TB
  * corpus does not fit in any single hash-agg), pass 2 recounts ONLY the
  * ≤ k candidates through a broadcast semi-join.
  *
  * Determinism: relevance uses integer-scaled idf (floor(10^6·N/df) by
  * integer division — identical on both engines) instead of float ln();
  * ranking ties break on doc_id. q85's candidate set may vary with
  * partitioning near the sketch's error floor, but the emitted rows are
  * exact counts filtered by an exact threshold that the MG invariant
  * guarantees is inside the candidate set — so the RESULT is engine- and
  * partitioning-independent.
  */
object Search extends QueryModule {

  // ---------------------------------------------------------------------
  // q84 — keyword search: tf·idf relevance top-20 for a fixed query over
  // the corpus. idf is the scaled-integer variant idf(t) = ⌊10^6·N/df(t)⌋
  // — rarer terms weigh more, engine-portable by construction (float
  // ln-idf differs at ulp level between libm implementations and would
  // break the hash gate; the ranking is order-isomorphic for single-term
  // weights).
  // ---------------------------------------------------------------------
  private val QueryTerms = Seq("spark", "join", "window", "vector", "stream")

  private val q84 = QueryDef(
    "q84_keyword_search",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val postings = docs
        .select($"doc_id", explode(Portable.tokens(lower($"text"))).as("term"))
        .filter($"term".isInCollection(QueryTerms))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"))
      val dfCounts = postings.groupBy($"term")
        .agg(countDistinct($"doc_id").as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      postings
        .join(broadcast(dfCounts), "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("idf_scaled", expr("(1000000 * n_docs) div df"))
        .groupBy($"doc_id")
        .agg(
          sum($"tf" * $"idf_scaled").as("score"),
          count(lit(1)).as("n_terms"))
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
    },
    Some {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""
      WITH toks AS (
        SELECT doc_id, unnest(${Portable.tokensSql("lower(text)")}) AS term
        FROM documents),
      p AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term IN ($termList) GROUP BY 1, 2),
      d AS (SELECT term, count(DISTINCT doc_id) AS df FROM p GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT p.doc_id,
             CAST(sum(p.tf * ((1000000 * n.n_docs) // d.df)) AS BIGINT) AS score,
             count(*) AS n_terms
      FROM p, d, n WHERE p.term = d.term
      GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20"""
    })

  // ---------------------------------------------------------------------
  // q85 — heavy-hitter tokens (exact counts for every token with
  // frequency ≥ 1% of the corpus) via sketch-then-verify: Misra–Gries
  // candidates (functions.FreqSketchAgg, k=256 ⇒ every token with count
  // > n/257 survives ⊇ all tokens ≥ n/100), then an exact recount of
  // candidates only. The threshold compare is pure integer arithmetic
  // (100·cnt ≥ n) — no division semantics to align.
  // ---------------------------------------------------------------------
  private val FreqK = 256

  private val q85 = QueryDef(
    "q85_heavy_hitters",
    (spark, dir) => {
      import spark.implicits._
      val toks = Tables.documents(spark, dir)
        .select(explode(Portable.tokens(lower($"text"))).as("token"))
      val cands = toks
        .agg(FreqSketchAgg.sketch($"token", FreqK).as("cands"))
        .select(explode($"cands").as("token"))
      val total = toks.agg(count(lit(1)).as("n_tokens"))
      toks
        .join(broadcast(cands), Seq("token"), "leftsemi")
        .groupBy($"token")
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter($"cnt" * 100 >= $"n_tokens")
        .orderBy($"cnt".desc, $"token")
    },
    Some(s"""
      WITH toks AS (
        SELECT unnest(${Portable.tokensSql("lower(text)")}) AS token
        FROM documents)
      SELECT token, count(*) AS cnt,
             (SELECT count(*) FROM toks) AS n_tokens
      FROM toks GROUP BY token
      HAVING 100 * count(*) >= (SELECT count(*) FROM toks)
      ORDER BY cnt DESC, token"""))

  override val defs: Seq[QueryDef] = Seq(q84, q85)
}
