package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case tests for the window/time-series operators (SURVEY.md §7.4:
  * pandas shift/rolling/pct_change boundary semantics).
  */
class WindowFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  test("q18: first row per ticker has null lag, last has null lead/direction") {
    val df = run("q18_lead_lag_labels").cache()
    val perTicker = df.groupBy("ticker").agg(
      count(lit(1)).as("n"),
      sum(col("close_prev").isNull.cast("long")).as("null_prev"),
      sum(col("close_next").isNull.cast("long")).as("null_next"),
      sum(col("direction").isNull.cast("long")).as("null_dir"))
    // exactly one boundary null on each side of every ticker series
    assert(perTicker.filter(col("null_prev") =!= 1 || col("null_next") =!= 1 ||
      col("null_dir") =!= 1).count() === 0)
    df.unpersist()
  }

  test("q20: strict rolling(3) is null for the first two rows per ticker, equal to ma3 after") {
    val df = run("q20_rolling_mean").cache()
    assert(df.filter(col("ma3").isNull).count() === 0) // min_periods=1 never null
    val strictNulls = df.groupBy("ticker")
      .agg(sum(col("ma3_strict").isNull.cast("long")).as("k"))
      .filter(col("k") =!= 2).count()
    assert(strictNulls === 0)
    assert(df.filter(col("ma3_strict").isNotNull && col("ma3_strict") =!= col("ma3"))
      .count() === 0)
    df.unpersist()
  }

  test("q21: sequence windows are exactly 5 long and trailing") {
    val df = run("q21_sequence_windows")
    assert(df.filter(size(split(col("seq_cents"), ",")) =!= 5).count() === 0)
  }

  test("q22: split sizes follow the 80/20 row_number rule") {
    val rows = run("q22_train_test_split").collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    val total = rows.values.sum
    assert(rows("train") === total * 8 / 10)
    assert(rows("test") === total - total * 8 / 10)
  }

  test("q24: z-scores have ~zero mean per ticker") {
    val bad = run("q24_standard_scaler")
      .groupBy("ticker").agg(avg(col("z")).as("m"))
      .filter(abs(col("m")) > 1e-9).count()
    assert(bad === 0)
  }

  test("q218: roles partition every (fold, row); embargo rows never train") {
    val rows = run("q218_purged_cv").collect()
    val byFold = rows.groupBy(_.getLong(0))
    assert(byFold.size === 5)
    // each fold sees the same total row count (the full bar table)
    val totals = byFold.values.map(_.map(_.getAs[Long]("n_rows")).sum).toSeq
    assert(totals.distinct.size === 1)
    // every fold has all three roles and a nonempty purged embargo
    byFold.values.foreach { rs =>
      val roles = rs.map(_.getString(1)).toSet
      assert(roles === Set("train", "test", "purged"), roles.toString)
      assert(rs.find(_.getString(1) == "purged").get.getAs[Long]("n_rows") > 0)
    }
  }

  test("q219: labels are consistent with the barrier arithmetic") {
    val out = run("q219_triple_barrier").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val label = r.getAs[Long]("label")
      val dte = r.getAs[Long]("days_to_event")
      assert(Set(-1L, 0L, 1L).contains(label))
      assert(dte >= 0L && dte <= 5L, s"days_to_event $dte")
      // a touch label always has a positive time-to-event
      if (label != 0L) assert(dte >= 1L)
    }
    // both barrier directions occur on real price paths
    val dist = out.groupBy(_.getAs[Long]("label")).view.mapValues(_.length)
    assert(dist.getOrElse(1L, 0) > 0 && dist.getOrElse(-1L, 0) > 0)
  }

  test("q223: streaming labeler ≡ batch q219 on decided entries, invariant to chunking") {
    import org.apache.spark.sql.functions.col
    val dir = graft.TestSpark.Sf001
    // expected = the batch label table minus the undecided tail (no touch
    // AND fewer than TbHorizon following bars — those stay open)
    val expected = WindowFeatures.tripleBarrier(spark, dir)
      .filter(col("label") =!= 0L ||
        (col("n") - col("rn")) >= WindowFeatures.TbHorizon.toLong)
      .select("ticker", "date", "cents", "label", "days_to_event")
      .collect().map(_.toString).sorted
    assert(expected.nonEmpty)
    // one batch and many small batches must both reproduce it exactly —
    // the state fold is batching-independent
    Seq(1, 7).foreach { chunks =>
      val got = WindowFeatures.streamTripleBarrier(spark, dir, chunks)
        .collect().map(_.toString).sorted
      assert(got.toSeq === expected.toSeq, s"chunking=$chunks diverged")
    }
  }

  test("q241: CPCV — 15 splits, roles partition rows, each group tests 5 times") {
    import org.apache.spark.sql.functions._
    val dir = graft.TestSpark.Sf001
    val out = graft.SparkEntry.queries("q241_cpcv")(spark, dir).cache()
    // C(6,2) = 15 splits present
    assert(out.select("g1", "g2").distinct().count() === 15)
    // roles partition every row: per split, Σ n_rows = total bar rows
    val barRows = graft.SparkEntry.queries("q02_daily_bars")(spark, dir).count()
    assert(out.groupBy("g1", "g2").agg(sum("n_rows").as("s"))
      .filter(col("s") =!= barRows).isEmpty)
    // each group appears as a test member in exactly N−1 = 5 splits
    val appear = out.filter(col("role") === "test")
      .select(explode(array(col("g1"), col("g2"))).as("g"))
      .groupBy("g").count()
    assert(appear.filter(col("count") =!= 5L).isEmpty)
    assert(appear.count() === 6)
    out.unpersist()
  }

  test("q240: cusum filter fires at the drift threshold, invariant to chunking") {
    import org.apache.spark.sql.functions.col
    val dir = graft.TestSpark.Sf001
    val base = WindowFeatures.streamCusum(spark, dir, 4).collect()
      .map(_.toString).sorted
    assert(base.nonEmpty)
    // reset semantics: every emitted magnitude is at/beyond ±200 millis
    WindowFeatures.streamCusum(spark, dir, 4).collect().foreach { r =>
      val (side, mag) = (r.getAs[Long]("side"), r.getAs[Long]("s_milli"))
      assert((side == 1L && mag >= 200L) || (side == -1L && mag <= -200L))
    }
    // a different replay chunking emits the identical event set
    val re = WindowFeatures.streamCusum(spark, dir, 9).collect()
      .map(_.toString).sorted
    assert(re.toSeq === base.toSeq)
  }
}
