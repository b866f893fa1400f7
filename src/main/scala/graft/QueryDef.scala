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
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
