package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch invariants: the candidate set always contains every
  * item above the error floor, whatever the partitioning, so the
  * sketch-then-verify heavy-hitters result is partition-independent.
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed synthetic stream: item i appears count(i) times
  private def items: Seq[String] =
    (Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++ Seq.fill(90)("gamma") ++
      (1 to 260).flatMap(i => Seq.fill(1 + i % 3)(s"noise_$i")))

  private def candidates(k: Int, parts: Int): Set[String] = {
    items.toDF("item").repartition(parts)
      .agg(FreqSketchAgg.sketch($"item", k).as("c"))
      .select(explode($"c").as("item"))
      .as[String].collect().toSet
  }

  test("every item with count > n/(k+1) survives, any partitioning") {
    val n = items.size
    val k = 16
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter(_._2 > n.toLong / (k + 1)).keySet
    for (parts <- Seq(1, 3, 13, 32)) {
      val got = candidates(k, parts)
      assert(mustKeep.subsetOf(got),
        s"parts=$parts missing ${mustKeep -- got}")
      assert(got.size <= k, s"parts=$parts buffer exceeded k: ${got.size}")
    }
  }

  test("sketch-then-exact-verify yields identical heavy hitters across partitionings") {
    def verified(parts: Int): Set[(String, Long)] = {
      val toks = items.toDF("item").repartition(parts)
      val cands = toks.agg(FreqSketchAgg.sketch($"item", 16).as("c"))
        .select(explode($"c").as("item"))
      val n = items.size.toLong
      toks.join(broadcast(cands), Seq("item"), "leftsemi")
        .groupBy($"item").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * 20 >= n) // threshold 5% > error floor n/17
        .as[(String, Long)].collect().toSet
    }
    val base = verified(1)
    assert(base.nonEmpty)
    assert(verified(7) === base)
    assert(verified(32) === base)
  }
}
