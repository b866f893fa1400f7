package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Misra–Gries frequent-items sketch as a one-pass mergeable aggregate
  * (third `TypedImperativeAggregate` next to MinHashAgg / KmvSketchAgg).
  *
  * Buffer: at most k (item → count) pairs. Update is the classic MG step
  * (hit: increment; room: insert; full: decrement all, evict zeros); merge
  * sums the two summaries and, if over capacity, subtracts the (k+1)-th
  * largest count from every entry and evicts the non-positives (the
  * Agarwal et al. mergeable-summaries rule). Invariant, regardless of
  * partitioning or merge order: every item with true frequency
  * > n/(k+1) survives in the buffer.
  *
  * The candidate SET can differ run-to-run near the error floor, so the
  * sketch output is never compared directly — the heavy-hitters query
  * recounts the candidates exactly and filters on the exact threshold,
  * which the invariant makes deterministic (see Search.q85). Partials are
  * bounded (≤ k strings + longs) whatever the input size — the property
  * that makes it a 100 TB aggregate: the first pass ships k entries per
  * partition instead of the full token dictionary.
  */
case class FreqSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the row's reused UTF8String backing buffer
      val item = v.asInstanceOf[UTF8String].toString
      if (buf.containsKey(item)) buf.put(item, buf.get(item) + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = if (a.containsKey(e.getKey)) a.get(e.getKey) else 0L
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, evict ≤ 0
      val counts = new java.util.ArrayList[Long](a.values())
      java.util.Collections.sort(counts, java.util.Collections.reverseOrder())
      decrementAll(a, counts.get(k))
    }
    a
  }

  private def decrementAll(m: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

object FreqSketchAgg {
  import org.apache.spark.sql.Column

  /** `freq_sketch(itemCol, k)` as a Column aggregate → array<string> of
    * heavy-hitter candidates (superset of all items with count > n/(k+1)).
    */
  def sketch(itemCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      FreqSketchAgg(org.apache.spark.sql.graft.bridge.expression(itemCol), k)
        .toAggregateExpression())
}
