package graft.sources

import graft.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for driver-regenerated fixtures (TESTDATA.md). The round-6
  * regeneration silently changed `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and broke 31 queries with opaque analysis errors;
  * this spec pins the layouts the readers understand so the NEXT change
  * fails here first, with a message that says what moved.
  */
class FixtureCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("events.ts physical type is a layout the readers normalize") {
    val raw = spark.read.parquet(s"${TestSpark.Sf001}/events.parquet")
    val t = raw.schema("ts").dataType
    assert(
      t == LongType || t == TimestampType || t == TimestampNTZType,
      s"events.ts arrived as $t — a NEW fixture layout. Teach Tables.events, " +
        "Streams.eventsStream and KafkaReplay.tsMicros about it before " +
        "anything else; see the round-7 notes in SCALE.md.")
  }

  test("normalized events frame presents the engine-wide contract") {
    val ev = Tables.events(spark, TestSpark.Sf001)
    assert(ev.schema("ts").dataType == TimestampType, ev.schema.treeString)
    val expected = Map(
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
    expected.foreach { case (name, dt) =>
      assert(ev.schema(name).dataType == dt, s"$name: ${ev.schema(name).dataType}")
    }
  }

  test("lineitem linenumber fits q182's *100 packed composite key") {
    // q182 cascades deletes over lineitem keyed on
    // l_orderkey*100 + l_linenumber; any linenumber >= 100 would collide
    // packed keys across orders and silently corrupt the survivor
    // checksum on BOTH engines. TPC-H caps linenumber at 7 — pin it.
    import org.apache.spark.sql.functions.{col, max}
    val mx = Tables.lineitem(spark, TestSpark.Sf001)
      .agg(max(col("l_linenumber").cast("long"))).head.getLong(0)
    assert(mx < 100L, s"max l_linenumber $mx >= 100 — widen q182's key pack")
  }

  test("documents and embeddings layouts are unchanged") {
    val d = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet").schema
    assert(d("doc_id").dataType == LongType && d("text").dataType == StringType &&
      d("lang").dataType == StringType && d("source").dataType == StringType &&
      d("n_chars").dataType == LongType, d.treeString)
    val e = spark.read.parquet(s"${TestSpark.Sf001}/embeddings.parquet").schema
    assert(e("vec_id").dataType == LongType &&
      e("embedding").dataType == ArrayType(FloatType) &&
      e("label").dataType == IntegerType, e.treeString)
  }
}
