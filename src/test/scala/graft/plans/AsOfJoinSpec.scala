package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics of the native as-of operator (q94 covers the
  * oracle-checked aggregate; this pins row-level behavior).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leftDf = Seq(
    ("a", 5L), ("a", 1L), ("a", 2L), ("b", 3L), ("b", 9L), ("c", 4L))
    .toDF("k", "t")
  private def rightDf = Seq(
    ("a", 2L, 10L), ("a", 5L, 20L), ("b", 4L, 30L), ("d", 1L, 99L))
    .toDF("qk", "qt", "v")

  private def result(leftParts: Int, rightParts: Int): Set[(String, Long, Option[Long], Option[Long])] =
    AsOf.join(
        leftDf.repartition(leftParts), rightDf.repartition(rightParts),
        Seq("k" -> "qk"), "t", "qt")
      .select($"k", $"t", $"qt", $"v")
      .as[(String, Long, Option[Long], Option[Long])]
      .collect().toSet

  private val expected = Set(
    ("a", 5L, Some(5L), Some(20L)),  // equal time matches
    ("a", 1L, None, None),           // before first quote
    ("a", 2L, Some(2L), Some(10L)),
    ("b", 3L, None, None),           // right key exists, all later
    ("b", 9L, Some(4L), Some(30L)),  // unbounded lookback
    ("c", 4L, None, None))           // key absent from right

  test("as-of semantics: latest right ≤ left time, nulls otherwise") {
    assert(result(1, 1) === expected)
  }

  test("result is partitioning-independent") {
    assert(result(4, 4) === expected)
    assert(result(7, 2) === expected)
    assert(result(2, 7) === expected)
  }

  test("empty right side yields all-null matches") {
    val got = AsOf.join(
        leftDf, rightDf.filter($"qk" === "nope"),
        Seq("k" -> "qk"), "t", "qt")
      .select($"qt").as[Option[Long]].collect()
    assert(got.length === 6 && got.forall(_.isEmpty))
  }

  test("NULL keys and times never match (SQL / DuckDB ASOF semantics)") {
    // left: a null key, a null time, and a normal row; right: a null key
    // and a null time row that must never be candidates, plus one real
    // quote the normal row should find
    val l = Seq(
      (Option.empty[String], Option(5L)),   // null key → left-outer nulls
      (Option("a"), Option.empty[Long]),    // null time → left-outer nulls
      (Option("a"), Option(5L)))            // matches the (a, 2) quote
      .toDF("k", "t")
    val r = Seq(
      (Option.empty[String], Option(1L), 7L),  // null key: never a candidate
      (Option("a"), Option.empty[Long], 8L),   // null time: never a candidate
      (Option("a"), Option(2L), 9L))
      .toDF("qk", "qt", "v")
    val got = AsOf.join(l, r, Seq("k" -> "qk"), "t", "qt")
      .select($"k", $"t", $"qt", $"v")
      .as[(Option[String], Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    assert(got === Set(
      (None, Some(5L), None, None),
      (Some("a"), None, None, None),
      (Some("a"), Some(5L), Some(2L), Some(9L))))
  }

  test("physical plan contains the custom exec") {
    val df = AsOf.join(leftDf, rightDf, Seq("k" -> "qk"), "t", "qt")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("left-only filter conjuncts push below the join; right-side ones stay above") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val df = AsOf.join(leftDf, rightDf, Seq("k" -> "qk"), "t", "qt")
      .filter($"t" >= 2L && $"v" > 15L) // left conjunct + right conjunct
    val opt = df.queryExecution.optimizedPlan
    // the as-of node's left child subtree must now contain the t-filter…
    val j = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    val leftFilters = j.left.collect { case f: LFilter => f.condition.sql }
    assert(leftFilters.exists(_.contains("t")), opt.treeString)
    // …and the residual filter above the join references only v
    val above = opt.collectFirst { case f: LFilter => f.condition.sql }
    assert(above.exists(c => c.contains("v") && !c.contains("`t`")), opt.treeString)
  }

  test("column pruning narrows both join inputs to referenced ∪ key/time columns") {
    // wide left (3 extra cols) and right (2 extra); the query touches one
    // non-key column per side — the pruned children must drop the rest
    val wl = leftDf.withColumn("lx", $"t" * 2).withColumn("ly", $"t" * 3)
      .withColumn("lz", $"t" * 5)
    val wr = rightDf.withColumn("rx", $"v" * 2)
    val df = AsOf.join(wl, wr, Seq("k" -> "qk"), "t", "qt")
      .select($"k", $"lx", $"v")
    val j = df.queryExecution.optimizedPlan
      .collectFirst { case a: AsOfJoinPlan => a }.get
    val lCols = j.left.output.map(_.name).toSet
    val rCols = j.right.output.map(_.name).toSet
    assert(lCols === Set("k", "t", "lx"), lCols)   // keys/time + referenced
    assert(rCols === Set("qk", "qt", "v"), rCols)
    // and the narrowed plan agrees with the same query optimized WITHOUT
    // the rules (clear-extraOptimizations-before-action baseline)
    val got = df.as[(String, Option[Long], Option[Long])].collect().toSet
    val baselineDf = AsOf.join(wl, wr, Seq("k" -> "qk"), "t", "qt")
      .select($"k", $"lx", $"v")
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try {
      val want = baselineDf.as[(String, Option[Long], Option[Long])].collect().toSet
      assert(got.nonEmpty && got === want)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("pushdown rule preserves semantics vs the unpushed plan") {
    val mk = () => AsOf.join(leftDf, rightDf, Seq("k" -> "qk"), "t", "qt")
      .filter($"t" >= 2L && $"v" > 15L)
      .select($"k", $"t", $"qt", $"v")
    val pushed = mk().collect().toSet // rule active (ensureStrategy adds it)
    // optimization is lazy: build the frame first (AsOf.join re-registers
    // the rule), THEN clear extraOptimizations, so the action optimizes
    // the same query without the rule — the unpushed baseline
    val unpushedDf = mk()
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try {
      val unpushed = unpushedDf.collect().toSet
      assert(pushed === unpushed)
      assert(pushed.nonEmpty)
    } finally spark.experimental.extraOptimizations = saved
  }
}
