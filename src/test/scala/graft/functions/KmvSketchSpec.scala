package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch correctness: the aggregate's (n_kept, kth) must equal the
  * naive sort-based k-th smallest distinct hash on any input, under any
  * partitioning (merge path), with duplicates (insensitivity), and below k
  * (exact path).
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8

  private def kmvOf(values: Seq[Long], partitions: Int): (Long, Option[Long]) = {
    val row = values.toDF("v").repartition(partitions)
      .withColumn("h", Portable.md5Hash64($"v".cast("string")))
      .agg(KmvSketchAgg.sketch($"h", K).as("kmv"))
      .select($"kmv.n_kept", $"kmv.kth")
      .head()
    (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1)))
  }

  private def naiveOf(values: Seq[Long]): (Long, Option[Long]) = {
    val hs = values.distinct.toDF("v")
      .select(Portable.md5Hash64($"v".cast("string")).as("h"))
      .distinct().as[Long].collect().sorted
    (math.min(hs.length, K).toLong, if (hs.length >= K) Some(hs(K - 1)) else None)
  }

  test("kmv equals the sort-based k-th smallest distinct hash") {
    val vs = (1L to 100L)
    assert(kmvOf(vs, 1) === naiveOf(vs))
  }

  test("kmv is partitioning-invariant (merge path)") {
    val vs = (1L to 100L)
    assert(kmvOf(vs, 7) === kmvOf(vs, 1))
    assert(kmvOf(vs, 32) === kmvOf(vs, 1))
  }

  test("kmv is duplicate-insensitive") {
    val base = (1L to 50L)
    val dups = base ++ base ++ base.take(10)
    assert(kmvOf(dups, 5) === kmvOf(base, 5))
  }

  test("below k distinct values the sketch is exact and kth is null") {
    val vs = (1L to 5L)
    val (n, kth) = kmvOf(vs, 3)
    assert(n === 5L && kth.isEmpty)
  }

  test("array-form sketch re-aggregates exactly (two-level == direct)") {
    // split values into 4 arbitrary "days", sketch each, explode + re-sketch
    // — must equal the direct one-level sketch ELEMENT-WISE (the q133
    // storage/merge property: k-min of union == k-min of union of k-mins)
    val vs = (1L to 200L)
    val df = vs.toDF("v")
      .withColumn("day", pmod($"v", lit(4L)))
      .withColumn("h", Portable.md5Hash64($"v".cast("string")))
    val direct = df.agg(KmvSketchAgg.sketchArray($"h", K).as("sk"))
      .select($"sk").as[Seq[Long]].head()
    val daily = df.groupBy($"day").agg(KmvSketchAgg.sketchArray($"h", K).as("sk"))
    val merged = daily.select(explode($"sk").as("h"))
      .agg(KmvSketchAgg.sketchArray($"h", K).as("sk"))
      .select($"sk").as[Seq[Long]].head()
    assert(merged === direct)
    assert(direct.length === K && direct === direct.sorted)
  }
}
