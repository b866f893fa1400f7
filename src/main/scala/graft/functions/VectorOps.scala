package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable vector arithmetic over `Array[Float]` embedding columns.
  *
  * Portability trick: each pairwise product of (float→double) values is an
  * IEEE-754 double op — bit-identical on any engine — but SUM order is not.
  * So every product is truncated to an exact integer at a fixed 1e15 scale
  * (floor of an identical double is identical), and the integer sum is
  * order-invariant. 64 dims × 1e15 < 2^63, no overflow. Cosine is then a
  * couple of double ops over exact integers — again bit-identical.
  *
  * At 100 TB this is per-row map work (zip_with/aggregate are codegen'd
  * array ops, no shuffle); the scaled-integer trick costs one floor per
  * element over the plain float path.
  */
object VectorOps {

  private val S = 1e15

  /** Scaled-integer dot product of two float-array columns — a native
    * codegen'd Catalyst expression (DotScaledExpr); the declarative
    * `zip_with`+`aggregate` equivalent is interpreted and ~6× slower.
    */
  def dotScaled(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(DotScaledExpr(
      org.apache.spark.sql.graft.bridge.expression(a),
      org.apache.spark.sql.graft.bridge.expression(b)))

  def dotScaledSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), " +
      s"p -> CAST(floor(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * $S) AS BIGINT))) AS BIGINT)"

  /** Scaled-integer squared norm. */
  def normScaled(a: Column): Column = dotScaled(a, a)
  def normScaledSql(a: String): String = dotScaledSql(a, a)

  /** Cosine from pre-computed scaled dot + scaled squared norms. */
  def cosineFromScaled(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))
  def cosineFromScaledSql(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / sqrt(CAST($na AS DOUBLE) * CAST($nb AS DOUBLE))"
}
