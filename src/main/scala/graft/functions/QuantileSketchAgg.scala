package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Mergeable rank/quantile sketch — the hole left in the sketch family
  * after KMV/HLL (distinct), CMS/Misra–Gries (frequency) and bitmap
  * masks: a bounded, mergeable summary that answers "value at rank p·n"
  * with a provable rank guarantee (SURVEY.md §7.2 step-7 sketches).
  *
  * DESIGN — why a canonical bottom-k sampler and not a literal KLL
  * compactor: KLL (Karnin–Lang–Liberty 2016) reaches its better space
  * bound by compacting buffers level-by-level, keeping odd or even
  * survivors per compaction. Making that choice by fixed rule instead of
  * RNG is easy, but the RESULT still depends on the ORDER buffers are
  * filled and merged — and Spark's partial aggregation merges partitions
  * in a nondeterministic order, so a compaction-based state violates the
  * engine's determinism contract (SURVEY.md §5: value-identical under
  * any partitioning) and can never hash-match a DuckDB replay. The
  * merge-order-INSENSITIVE form of quantile sketching is hash-rank
  * sampling: keep the k rows whose salted 60-bit hash (Portable
  * .md5Hash64 over a row-unique key — the q152/q199 salted-hash
  * discipline) is smallest. The retained set is a canonical function of
  * the input SET — "k smallest of a union = k smallest of the union of
  * each part's k smallest" (the exact-merge property KMV rides) — so
  * aggregation is partitioning-independent, two-level re-aggregation of
  * stored sketches is bit-exact (the q133 cube discipline), and DuckDB
  * reproduces the state with one `row_number() OVER (ORDER BY h)`.
  *
  * GUARANTEE: the k retained rows are a uniform-without-replacement
  * sample of the group (the hash is uniform on a row-unique key, so
  * selecting the k smallest hashes selects k uniform rows). By
  * Dvoretzky–Kiefer–Wolfowitz, the sample CDF is within
  * ε = sqrt(ln(2/δ) / 2k) of the true CDF with probability ≥ 1−δ —
  * with k = 1024 and δ = 1%, ε ≈ 5.09% of n. The q311 query audits the
  * REALIZED rank error of every estimate against that budget in the
  * same row (the q144 exact-vs-estimate discipline) and its spec fails
  * if any group/percentile lands outside. Groups with ≤ k rows are held
  * exactly (the sample is the whole group, error 0).
  *
  * Buffer: a TreeMap hash → value holding the k smallest distinct
  * hashes; a 60-bit hash collision (≈0 at any real k) keeps the smaller
  * value deterministically on both engines (oracle: min(value) GROUP BY
  * h). Output: struct(n = exact row count, sample = the retained values
  * sorted ASCENDING BY VALUE — quantile-ready). Partials are ≤ k pairs
  * + one count regardless of input size — the 100 TB property: the
  * shuffle ships k values per (group, partition), never the group.
  */
case class QuantileSketchAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchAgg.Buf] {

  import QuantileSketchAgg.Buf

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = new StructType()
    .add("n", LongType, nullable = false)
    .add("sample", ArrayType(LongType, containsNull = false), nullable = false)
  override def prettyName: String = "bottomk_quantile_sketch"

  override def createAggregationBuffer(): Buf = new Buf()

  private def insert(buf: Buf, h: Long, v: Long): Unit = {
    val prev = buf.m.get(h)
    if (prev != null) {
      if (v < prev) { buf.m.put(h, v); () }
    } else {
      buf.m.put(h, v)
      if (buf.m.size > k) { buf.m.remove(buf.m.lastKey()); () }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      buf.n += 1
      insert(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.n += b.n
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val vs = new Array[Long](buf.m.size)
    val it = buf.m.values().iterator()
    var i = 0
    while (it.hasNext) { vs(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vs)
    InternalRow(buf.n, new GenericArrayData(vs))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 16 * buf.m.size)
    bb.putLong(buf.n)
    bb.putInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf()
    buf.n = bb.getLong
    val sz = bb.getInt
    var i = 0
    while (i < sz) { buf.m.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(hash = newChildren(0), value = newChildren(1))
}

/** The same bottom-k quantile sketch evaluated to its FULL state — exact
  * row count plus the retained (hash, value) pairs in hash order —
  * instead of the value-sorted sample. This is the STORAGE form (the
  * KmvArraySketchAgg discipline): a per-partition (e.g. per-day) sketch
  * written to a table re-aggregates EXACTLY, because the k smallest
  * hashes of a union equal the k smallest of the union of each part's k
  * smallest — so a declarative merge over stored pairs (explode →
  * min-per-hash → k smallest by hash) reproduces the direct corpus
  * sketch bit-for-bit (q314 proves it against the q311-shape direct
  * SQL). Daily sketch rows are ≤ k pairs; any date range's quantile
  * estimate comes from merging them without touching raw data again.
  */
case class QuantileSketchArrayAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchAgg.Buf] {

  import QuantileSketchAgg.Buf

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  private val pairType = new StructType()
    .add("h", LongType, nullable = false)
    .add("v", LongType, nullable = false)
  override def dataType: DataType = new StructType()
    .add("n", LongType, nullable = false)
    .add("pairs", ArrayType(pairType, containsNull = false), nullable = false)
  override def prettyName: String = "bottomk_quantile_sketch_array"

  override def createAggregationBuffer(): Buf = new Buf()

  private def insert(buf: Buf, h: Long, v: Long): Unit = {
    val prev = buf.m.get(h)
    if (prev != null) {
      if (v < prev) { buf.m.put(h, v); () }
    } else {
      buf.m.put(h, v)
      if (buf.m.size > k) { buf.m.remove(buf.m.lastKey()); () }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      buf.n += 1
      insert(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.n += b.n
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val ps = new Array[Any](buf.m.size)
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      ps(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(ps))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 16 * buf.m.size)
    bb.putLong(buf.n)
    bb.putInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf()
    buf.n = bb.getLong
    val sz = bb.getInt
    var i = 0
    while (i < sz) { buf.m.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchArrayAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchArrayAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchArrayAgg =
    copy(hash = newChildren(0), value = newChildren(1))
}

object QuantileSketchAgg {
  import org.apache.spark.sql.Column

  /** Mutable sketch state: exact row count + the k smallest (hash →
    * value) pairs. A plain class (not a case class) because the
    * TypedImperativeAggregate contract mutates it in place.
    */
  final class Buf {
    var n: Long = 0L
    val m: java.util.TreeMap[java.lang.Long, java.lang.Long] =
      new java.util.TreeMap[java.lang.Long, java.lang.Long]()
  }

  /** `bottomk_quantile_sketch(hash, value, k)` → struct(n, sample). */
  def sketch(hashCol: Column, valueCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      QuantileSketchAgg(
        org.apache.spark.sql.graft.bridge.expression(hashCol),
        org.apache.spark.sql.graft.bridge.expression(valueCol), k)
        .toAggregateExpression())

  /** `bottomk_quantile_sketch_array(hash, value, k)` → struct(n, pairs)
    * — the storage form (h-ordered (h, v) pairs, exact-mergeable).
    */
  def sketchArray(hashCol: Column, valueCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      QuantileSketchArrayAgg(
        org.apache.spark.sql.graft.bridge.expression(hashCol),
        org.apache.spark.sql.graft.bridge.expression(valueCol), k)
        .toAggregateExpression())
}
