package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives, each emitted twice: as a Spark
  * `Column` and as the equivalent DuckDB SQL text. The correctness gate
  * hash-compares Spark output against DuckDB replay (SURVEY.md §5), so any
  * hash/score used in a compared result must be reproducible bit-for-bit on
  * both engines — which rules out engine-native `hash()`/`xxhash64` and any
  * float accumulation.
  */
object Portable {

  /** 60-bit deterministic hash: first 15 hex digits of md5, as a positive
    * BIGINT. md5 is the one hash both engines share byte-for-byte.
    * Computed by the codegen'd [[Md5Hash64Expr]] — bit-identical to the
    * declarative `conv(substring(md5(c), 1, 15), 16, 10)` chain (the
    * oracle's form, and PortableHashSpec pins the equivalence) but with
    * zero intermediate strings.
    */
  def md5Hash64(c: Column): Column = Md5Hash64Expr.hash(c)
  def md5Hash64Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** Large prime for modular hash mixing (fits comfortably in 63-bit
    * intermediate products: P*31 + P < 2^35).
    */
  val P: Long = 1000000007L

  /** Polynomial rolling hash over an array of strings (document
    * fingerprinting): fold (acc*31 + md5_60(w) % P) % P in array order.
    */
  def rollingHash(words: Column): Column =
    aggregate(
      words,
      lit(0L),
      (acc, w) => (acc * 31 + md5Hash64(w) % P) % P)
  def rollingHashSql(wordsExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($wordsExpr, " +
      s"w -> ${md5Hash64Sql("w")} % $P)), (a, h) -> (a * 31 + h) % $P)"

  /** Sign-peeled integer banding: `e div w` with the division applied to
    * the ABSOLUTE value and the sign restored afterwards, emitted as SQL
    * text for both engines (`div` on Spark, `//` on DuckDB). Needed
    * because the engines disagree on negative operands — Spark's `div`
    * truncates toward zero while DuckDB's `//` floors — so a raw banding
    * of a negative value silently hash-mismatches; peeling the sign makes
    * both engines divide a non-negative value, where they agree.
    */
  def bandSql(e: String, w: Long, divOp: String): String =
    s"(CASE WHEN ($e) >= 0 THEN ($e) $divOp $w" +
      s" ELSE -((-($e)) $divOp $w) END)"

  /** Whitespace tokens of a text column. */
  def tokens(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))
  def tokensSql(e: String): String = s"regexp_extract_all($e, '\\S+')"

  /** JVM twin of [[md5Hash64]] — the identical 60-bit value for the same
    * string, usable inside typed map functions where no Column exists.
    */
  def md5Hash64Jvm(s: String): Long =
    Md5Hash64Expr.hashBytes(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
