package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the Series module (q137–q140) beyond the DuckDB oracle:
  * structural properties that must hold at ANY scale, not just the values
  * the fixture happens to produce.
  */
class SeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.Sf001

  test("q137: calendar is dense — |types| x |span| rows, each type covers the full span") {
    val out = graft.SparkEntry.queries("q137_gap_fill")(spark, dir).cache()
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
    val span = ev.agg(
      (datediff(max(to_date($"ts")), min(to_date($"ts"))) + 1).as("d"))
      .as[Int].head()
    val nTypes = ev.select($"event_type").distinct().count()
    assert(out.count() === nTypes * span)
    val perType = out.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .select($"n").as[Long].collect()
    assert(perType.forall(_ === span))
    // forward fill: once a type has observed a day, filled_sum is never null
    val badFill = out
      .withColumn("seen", max(when($"is_gap" === 0, lit(1)).otherwise(0))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter($"seen" === 1 && $"filled_sum".isNull)
    assert(badFill.isEmpty)
    out.unpersist()
  }

  test("q137: observed days carry their own sum; gaps carry the previous fill") {
    val out = graft.SparkEntry.queries("q137_gap_fill")(spark, dir)
    assert(out.filter($"is_gap" === 0 && !($"filled_sum" <=> $"day_sum")).isEmpty)
    assert(out.filter($"is_gap" === 1 && $"day_sum".isNotNull).isEmpty)
  }

  test("q138: OLS residuals sum to ~0 per series (normal-equation identity)") {
    val fit = graft.SparkEntry.queries("q138_ols_trend")(spark, dir)
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
    val daily = ev.groupBy($"event_type", to_date($"ts").as("day"))
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(28, 2))
        .cast("double")).as("y"))
    val lo = ev.agg(min(to_date($"ts")).as("lo"))
    val resid = daily.crossJoin(broadcast(lo))
      .withColumn("x", datediff($"day", $"lo").cast("double"))
      .join(fit, "event_type")
      .withColumn("r", $"y" - ($"intercept" + $"slope" * $"x"))
      .groupBy($"event_type").agg(sum($"r").as("sr"), count(lit(1)).as("n"))
    val rows = resid.select($"sr", $"n").as[(Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sr, n) => assert(math.abs(sr / n) < 1e-6) }
  }

  test("q139: versions are contiguous from 1, intervals abut, runs alternate") {
    val out = graft.SparkEntry.queries("q139_scd2_history")(spark, dir).cache()
    // contiguous versions per user
    val vCheck = out.groupBy($"user_id")
      .agg(min($"version").as("lo"), max($"version").as("hi"),
        count(lit(1)).as("n"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n")
    assert(vCheck.isEmpty)
    // exactly one open (current) interval per user; valid_from < valid_to
    assert(out.filter($"is_current" === 1).groupBy($"user_id")
      .count().filter($"count" =!= 1L).isEmpty)
    assert(out.filter($"valid_to".isNotNull && $"valid_from" >= $"valid_to").isEmpty)
    // consecutive versions never share the attribute (maximal runs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"version")
    assert(out.withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev" === $"event_type").isEmpty)
    // event conservation: run lengths sum to the filtered event count
    val total = Tables.events(spark, dir)
      .filter($"ts".isNotNull && $"user_id".isNotNull).count()
    assert(out.agg(sum($"n_events")).as[Long].head() === total)
    out.unpersist()
  }

  test("q140: count-min never undercounts, and the sketch stays within d*w cells") {
    val out = graft.SparkEntry.queries("q140_cms_frequency")(spark, dir).cache()
    assert(out.count() === 20)
    assert(out.filter($"cms_n" < $"exact_n").isEmpty)
    assert(out.filter($"overcount" =!= $"cms_n" - $"exact_n").isEmpty)
    out.unpersist()
  }
}
