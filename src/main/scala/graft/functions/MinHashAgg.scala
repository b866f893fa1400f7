package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** One-pass MinHash signature aggregate (SURVEY.md §7.3: custom
  * `TypedImperativeAggregate` for the dedup/sketch extensions).
  *
  * Input: a 60-bit shingle hash per row (Portable.md5Hash64 % P). Buffer:
  * the running minima of the `numHashes` affine permutations
  * (a_j·h + b_j) mod P — i.e. the whole MinHash signature in ONE
  * aggregation buffer instead of `numHashes` separate min() columns.
  * Output: array<bigint> of length `numHashes`.
  *
  * The affine family (a, b) is passed in so the SQL oracle can replicate
  * the exact same signature with per-column min() aggregates — the two
  * formulations are value-identical by construction.
  */
case class MinHashAgg(
    child: Expression,
    hashA: Seq[Long],
    hashB: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val P = Portable.P
  private def k = hashA.length

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < k) {
        val m = (hashA(j) * h + hashB(j)) % P
        if (m < buf(j)) buf(j) = m
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  import org.apache.spark.sql.Column

  /** `minhash_sig(hashCol)` as a Column aggregate. */
  def signature(hashCol: Column, hashA: Seq[Long], hashB: Seq[Long]): Column =
    org.apache.spark.sql.graft.bridge.column(
      MinHashAgg(org.apache.spark.sql.graft.bridge.expression(hashCol),
        hashA, hashB).toAggregateExpression())
}
