package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the in-engine model operators added in round 7:
  * q148 (power iteration), q149 (bigram Naive Bayes), q150 (Markov
  * transitions).
  */
class ModelOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.Sf001

  test("q148: direction has 64 dims, max-abs exactly 1000, and is not degenerate") {
    val v = graft.SparkEntry.queries("q148_power_iteration")(spark, dir).cache()
    assert(v.count() === 64)
    assert(v.agg(max(abs($"v"))).as[Long].head() === 1000L)
    // a real principal direction has spread — not all components equal
    assert(v.select($"v").distinct().count() > 8)
    v.unpersist()
  }

  test("q148: the returned direction is Rayleigh-dominant over the all-ones start") {
    // (v·x)² summed over rows must be >= the same for the all-ones
    // direction after matching norms — the defining property of three
    // power-iteration rounds having moved toward the top eigenvector.
    val vArr = graft.SparkEntry.queries("q148_power_iteration")(spark, dir)
      .orderBy($"d").select($"v").as[Long].collect()
    val e = Tables.embeddings(spark, dir)
      .select(transform($"embedding",
        x => floor(x.cast("double") * 1000).cast("long")).as("e"))
    def quad(dirVec: Array[Long]): Double = {
      val lits = array(dirVec.map(lit): _*)
      val row = e.select(
        aggregate(zip_with($"e", lits, (a, b) => a * b), lit(0L),
          (acc, x) => acc + x).as("s"))
        .agg(sum($"s".cast("double") * $"s".cast("double")).as("q"))
        .as[Double].head()
      val norm2 = dirVec.map(x => x.toDouble * x.toDouble).sum
      row / norm2
    }
    val ones = Array.fill(64)(1000L)
    assert(quad(vArr) >= quad(ones))
  }

  test("q149: bigram NB beats every class's coin flip (diagonal dominance)") {
    val cm = graft.SparkEntry.queries("q149_naive_bayes_langid")(spark, dir)
      .cache()
    val acc = cm.groupBy($"lang").agg(
      (sum(when($"lang" === $"pred_lang", $"n_docs").otherwise(0L)).cast("double") /
        sum($"n_docs").cast("double")).as("acc"))
    // measured 0.66–0.91 per class at sf0.001; 0.5 is the degeneracy alarm
    assert(acc.filter($"acc" < 0.5).isEmpty)
    // total docs conserved
    val total = Tables.documents(spark, dir).count()
    assert(cm.agg(sum($"n_docs")).as[Long].head() === total)
    cm.unpersist()
  }

  test("q150: transition rows partition each from-state and probabilities are consistent") {
    val t = graft.SparkEntry.queries("q150_markov_transitions")(spark, dir)
      .cache()
    assert(t.groupBy($"from_type").agg(sum($"n").as("s"), max($"n_from").as("f"))
      .filter($"s" =!= $"f").isEmpty)
    assert(t.filter($"p" <= 0.0 || $"p" > 1.0).isEmpty)
    assert(t.filter(($"from_type" === $"to_type") =!= ($"self_loop" === 1)).isEmpty)
    t.unpersist()
  }
}
