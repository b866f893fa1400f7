package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** KMV (k-minimum-values) distinct-count sketch as a one-pass mergeable
  * aggregate (SURVEY.md §7.3 "novel sketch" extension).
  *
  * Input: a 60-bit uniform hash per row (Portable.md5Hash64 — duplicates of
  * a value hash identically, so the sketch is duplicate-insensitive by
  * construction). Buffer: the k smallest DISTINCT hashes seen, as a sorted
  * array. Output: struct(n_kept, kth) where kth is the k-th smallest
  * distinct hash (null while fewer than k distinct values exist). The
  * classic estimator is then (k−1) / (kth / 2^60); when kth is null the
  * sketch holds the whole distinct set and n_kept IS the exact count.
  *
  * Unlike HLL this sketch is exactly reproducible on any engine from the
  * same hash function — the DuckDB oracle recomputes kth with a plain
  * `row_number() OVER (ORDER BY h)` on distinct hashes and must match
  * bit-for-bit. Partials are bounded (≤ k longs), so map-side combine ships
  * k values per group per partition regardless of input size — the property
  * that makes it a 100 TB aggregate.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = new StructType()
    .add("n_kept", LongType, nullable = false)
    .add("kth", LongType, nullable = true)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.remove(buf.last); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val kth: Any = if (buf.size >= k) buf.last.longValue() else null
    InternalRow(buf.size.toLong, kth)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** The same KMV sketch evaluated to its FULL state — the sorted k-min
  * distinct-hash array — instead of the (n_kept, kth) summary. This is
  * the STORAGE form: a per-partition (e.g. per-day) sketch written to a
  * table re-aggregates exactly, because the k smallest of a union equal
  * the k smallest of the union of each part's k smallest — so
  * `explode(stored_sketch)` → re-sketch reproduces the direct corpus
  * sketch bit-for-bit (q133 proves it against the q65 oracle). That is
  * the pre-aggregated-cube discipline: daily sketch rows are a few
  * hundred bytes, and any date range's distinct estimate comes from
  * merging them without touching raw data again.
  */
case class KmvArraySketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch_array"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.remove(buf.last); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvArraySketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvArraySketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvArraySketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  import org.apache.spark.sql.Column

  /** `kmv_sketch(hashCol, k)` as a Column aggregate → struct(n_kept, kth). */
  def sketch(hashCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      KmvSketchAgg(org.apache.spark.sql.graft.bridge.expression(hashCol), k)
        .toAggregateExpression())

  /** `kmv_sketch_array(hashCol, k)` → the sorted k-min array (storage form). */
  def sketchArray(hashCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      KmvArraySketchAgg(org.apache.spark.sql.graft.bridge.expression(hashCol), k)
        .toAggregateExpression())
}
