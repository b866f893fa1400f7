package graft

import graft.sources.Tables
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Production observability surface: `df.observe` attaches metric
  * expressions that the engine computes DURING the action (accumulator-
  * backed, zero extra passes) — the monitoring hook a deployed pipeline
  * uses instead of re-running audit queries. The observed values must
  * equal what a standalone aggregate computes.
  */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observe() metrics match a standalone aggregate, at zero extra passes") {
    val obs = Observation("events_metrics")
    val ev = Tables.events(spark, TestSpark.Sf001).filter($"ts".isNotNull)
    val observed = ev.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(($"value".cast(DecimalType(28, 2)) * 100).cast("long")).as("cents"),
      max($"ts").as("max_ts"))
    observed.write.format("noop").mode("overwrite").save()
    val expected = ev.agg(
      count(lit(1)).as("n_rows"),
      sum(($"value".cast(DecimalType(28, 2)) * 100).cast("long")).as("cents"),
      max($"ts").as("max_ts")).collect()(0)
    assert(obs.get("n_rows") === expected.getLong(0))
    assert(obs.get("cents") === expected.getLong(1))
    assert(obs.get("max_ts") === expected.getTimestamp(2))
  }

  test("observe() composes with a downstream aggregate in the same action") {
    val obs = Observation("bronze_rows")
    val ev = Tables.events(spark, TestSpark.Sf001).filter($"ts".isNotNull)
    val out = ev.observe(obs, count(lit(1)).as("n"))
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .collect()
    assert(out.map(_.getLong(1)).sum === obs.get("n"))
  }
}
