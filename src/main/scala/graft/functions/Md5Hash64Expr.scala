package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's 60-bit portable hash as ONE native codegen expression —
  * bit-identical to the declarative chain it replaces
  * (`conv(substring(md5(c), 1, 15), 16, 10) cast long`, see
  * [[Portable.md5Hash64]]) but without any of the chain's intermediate
  * allocations. The declarative form materializes, per call: a 32-char
  * hex UTF8String (md5), a 15-char substring copy, a decimal string
  * (conv), and a string→long parse (cast). The first 15 hex digits of a
  * digest are just its top 60 bits, so the whole chain collapses to
  * "digest 16 bytes, big-endian-read the first 8, shift right 4" — no
  * strings anywhere.
  *
  * This is the hottest scalar in the engine (shingle/gram/token hashing
  * feeds the dedup, retrieval, sketch and sampling families — ~80 call
  * sites), which is why it gets the custom-expression treatment the
  * same way CharShinglesExpr did for shingle extraction.
  *
  * The MessageDigest instance is thread-local: `getInstance` per row is
  * measurable allocation + provider lookup, and tasks are
  * single-threaded so reuse is safe.
  */
case class Md5Hash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hash64 requires a string or binary child, got $t")
  }
  override def dataType: DataType = LongType
  // the declarative chain ends in cast(conv(...)) which is nullable —
  // keep the same schema so downstream plans and written schemas match
  override def nullable: Boolean = true
  override def prettyName: String = "md5_hash64"

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String  => Md5Hash64Expr.hashBytes(s.getBytes)
    case b: Array[Byte] => Md5Hash64Expr.hashBytes(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val conv =
        if (child.dataType == BinaryType) s
        else s"$s.getBytes()"
      s"${ev.value} = graft.functions.Md5Hash64Expr.hashBytes($conv);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64Expr =
    copy(child = newChild)
}

object Md5Hash64Expr {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(bytes) as an unsigned long — i.e. the
    * top 60 bits of the digest. Called from generated code.
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  def hash(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      Md5Hash64Expr(org.apache.spark.sql.graft.bridge.expression(c)))
}
