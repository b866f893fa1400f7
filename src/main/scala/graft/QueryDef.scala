package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark-first DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL that
  * the driver runs on the same parquet tables for a hash compare.
  *
  * Determinism contract (SURVEY.md §5/§7.4): every query must be
  * value-deterministic across partitionings — exact decimal sums for money
  * columns, `min_by`/`max_by` with a unique ordering key instead of
  * `first`/`last`, explicit ORDER BY with full tie-breakers, no
  * `current_timestamp`, no RNG.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracleGen: Option[() => String]) {

  /** The oracle SQL, generated on demand — most queries carry a plain
    * string; a DEFERRED oracle (e.g. q113's, which derives its CASE-WHEN
    * from bytes read back out of the parquet model store) is generated at
    * dump time, when a SparkSession exists.
    */
  def oracle: Option[String] = oracleGen.map(_())
}

object QueryDef {
  /** Plain-string oracle — the common case. (DummyImplicit dodges the
    * erasure clash with the synthesized Option[() => String] apply.)
    */
  def apply(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])(implicit d: DummyImplicit): QueryDef =
    QueryDef(name, build, oracle.map(s => () => s))

  /** Oracle generated lazily at dump time (session-dependent inputs). */
  def deferred(
      name: String,
      build: (SparkSession, String) => DataFrame)(gen: => String): QueryDef =
    QueryDef(name, build, Some(() => gen))
}

trait QueryModule {
  def defs: Seq[QueryDef]
}
