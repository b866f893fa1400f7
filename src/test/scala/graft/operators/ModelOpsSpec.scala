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

  test("q151: triangle memberships are wedge-bounded and divisible by 3 in total") {
    val t = graft.SparkEntry.queries("q151_triangle_count")(spark, dir).cache()
    assert(t.filter($"degree" < 1).isEmpty)
    // a node in T triangles needs at least T distinct neighbor pairs
    assert(t.filter($"n_triangles" * 2 > $"degree" * ($"degree" - 1)).isEmpty)
    // every triangle contributes exactly 3 memberships
    assert(t.agg(sum($"n_triangles")).as[Long].head() % 3 === 0)
    t.unpersist()
  }

  test("q152: jackknife SE is positive and the jackknife mean tracks the sample mean") {
    val j = graft.SparkEntry.queries("q152_jackknife_se")(spark, dir).cache()
    assert(j.filter($"jk_se" <= 0.0).isEmpty)
    // delete-a-group jackknife of the MEAN recenters within a few SEs
    assert(j.filter(abs($"mean_cents" - $"jk_mean") > $"jk_se" * 5 + 1.0).isEmpty)
    j.unpersist()
  }

  test("q153: VWAP sits inside each day's unit-price envelope") {
    val v = graft.SparkEntry.queries("q153_vwap")(spark, dir)
    val env = Tables.lineitem(spark, dir)
      .withColumn("unit", $"l_extendedprice" / $"l_quantity")
      .groupBy($"l_suppkey".as("ticker"),
        to_date($"l_shipdate").as("date"))
      .agg(min($"unit").as("lo"), max($"unit").as("hi"))
    // vwap is in cents-per-centiunit = dollars-per-unit
    assert(v.join(env, Seq("ticker", "date"))
      .filter($"vwap" < $"lo" * 0.999 || $"vwap" > $"hi" * 1.001).isEmpty)
    assert(v.agg(sum($"n_trades")).as[Long].head() ===
      Tables.lineitem(spark, dir).count())
  }

  test("q154: histogram is exactly macd minus signal") {
    val m = graft.SparkEntry.queries("q154_macd")(spark, dir)
    assert(m.filter(
      abs($"histogram_cents" - ($"macd_cents" - $"signal_cents")) > 1e-9).isEmpty)
  }

  test("q155: drawdown is a fraction of peak and the trough date is in range") {
    val d = graft.SparkEntry.queries("q155_max_drawdown")(spark, dir).cache()
    assert(d.filter($"max_dd_bp" < 0 || $"max_dd_bp" >= 10000).isEmpty)
    assert(d.filter($"max_dd_frac" =!= $"max_dd_bp".cast("double") / 10000.0).isEmpty)
    assert(d.filter($"trough_date".isNull).isEmpty)
    d.unpersist()
  }

  test("in-engine k-means is cost-competitive with MLlib KMeans at the same k") {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k = Corpus.derivedK(spark, dir).toInt
    val ours = Corpus.inertia(spark, dir,
      Corpus.kmeansCentroids(spark, dir, Corpus.KmIters))
    // our coordinates are floor(x·1e6) longs → distances carry 1e12
    val oursRaw = ours.toDouble / 1e12
    val feats = Tables.embeddings(spark, dir)
      .select(array_to_vector($"embedding".cast("array<double>")).as("features"))
    val mllib = new KMeans().setK(k).setSeed(42L).setMaxIter(20)
      .fit(feats).summary.trainingCost
    // the deterministic 3-round Lloyd's must land within 2× of MLlib's
    // 20-iteration k-means|| cost — "competitive", not "identical": the
    // in-engine form trades iterations for bit-reproducibility
    assert(oursRaw <= mllib * 2.0,
      s"ours=$oursRaw mllib=$mllib k=$k")
    assert(oursRaw > 0.0)
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

  test("q263: exact AUC matches a brute-force midrank Mann-Whitney on the driver") {
    val out = graft.SparkEntry.queries("q263_ranker_auc")(spark, dir).collect()
    assert(out.length >= 5, "calibration table degenerate")
    val n1 = out.head.getAs[Long]("n1")
    val n0 = out.head.getAs[Long]("n0")
    assert(out.map(_.getAs[Long]("n_docs")).sum === n1 + n0)
    out.foreach { r =>
      assert(r.getAs[Long]("pos_rate_milli") ===
        1000L * r.getAs[Long]("n_pos") / r.getAs[Long]("n_docs"))
    }
    // brute force: collect (score, label), midrank U statistic
    val d = TextOps.withQuality(Tables.documents(spark, dir))
      .select($"doc_id", ($"score" >= 0.6).cast("long").as("y"))
      .join(Search.lmAllDocs(spark, dir)
        .select($"doc_id", (-$"milli").as("s")), "doc_id")
      .select($"s", $"y").as[(Long, Long)].collect()
    val sorted = d.sortBy(_._1)
    // twice-midranks per tie group
    val r2 = scala.collection.mutable.Map.empty[Long, Long]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      // ranks i+1..j (1-based); twice-midrank = (i+1) + j
      r2(sorted(i)._1) = (i + 1).toLong + j.toLong
      i = j
    }
    val sumR2pos = sorted.filter(_._2 == 1L).map(r => r2(r._1)).sum
    val u2 = sumR2pos - n1 * (n1 + 1)
    assert(out.head.getAs[Long]("auc_milli") === 1000L * u2 / (2L * n1 * n0))
  }
}