package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GBT artifact: wire-format round-trip, compiled-expression scoring vs
  * the driver-side reference walk, and malformed-artifact rejection.
  */
class GbtArtifactSpec extends AnyFunSuite {
  import GbtArtifact._
  private lazy val spark = TestSpark.spark

  private val model = deserialize(demoArtifact)

  test("serialize/deserialize round-trips the model exactly") {
    assert(model.numFeatures === 2)
    assert(model.trees.size === 3)
    assert(serialize(model).toSeq === demoArtifact.toSeq)
    assert(deserialize(serialize(model)) === model)
  }

  test("compiled expression scoring equals the local tree walk") {
    import spark.implicits._
    // feature grid crossing every split threshold on both sides
    val f0s = Seq(-0.02, -0.01, -0.005, 0.0, 0.0049, 0.005, 0.01, 0.02, 0.03)
    val f1s = Seq(0.0, 4.9e-5, 5.0e-5, 1.0e-4, 2.0e-4, 3.0e-4)
    val rows = for (a <- f0s; b <- f1s) yield (a, b)
    val got = rows.toDF("f0", "f1")
      .withColumn("s", score(model, Seq($"f0", $"f1")))
      .select($"f0", $"f1", $"s")
      .as[(Double, Double, Double)].collect()
    got.foreach { case (a, b, s) =>
      assert(s === scoreLocal(model, Seq(a, b)), s"mismatch at ($a, $b)")
    }
  }

  test("scoreSql mirrors the compiled expression on the same grid") {
    import spark.implicits._
    val rows = Seq((-0.01, 1.0e-4), (0.006, 0.0), (0.03, 3.0e-4))
    val sql = scoreSql(model, Seq("f0", "f1"))
    rows.toDF("f0", "f1").createOrReplaceTempView("gbt_grid")
    val viaSql = spark.sql(s"SELECT $sql AS s FROM gbt_grid")
      .as[Double].collect().toSeq
    val viaExpr = rows.map { case (a, b) => scoreLocal(model, Seq(a, b)) }
    assert(viaSql === viaExpr)
  }

  test("malformed artifacts are rejected loudly") {
    intercept[IllegalArgumentException](deserialize(Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException](
      deserialize(demoArtifact ++ Array[Byte](0)))
    intercept[IllegalArgumentException](
      score(model, Seq(lit(0.0)))) // wrong feature arity
  }

  test("corrupt node structure is rejected at load time, not at score time") {
    // backward child pointer (a cycle) — must fail deserialize, not
    // stack-overflow later inside score()
    val cyclic = Model(2, 0.0, Seq(Tree(IndexedSeq(
      Internal(0, 0.5, 1, 2), Internal(1, 0.5, 0, 2), Leaf(1.0)))))
    intercept[IllegalArgumentException](deserialize(serialize(cyclic)))
    // out-of-range child index
    val oob = Model(2, 0.0, Seq(Tree(IndexedSeq(
      Internal(0, 0.5, 1, 7), Leaf(0.0)))))
    intercept[IllegalArgumentException](deserialize(serialize(oob)))
    // split on a feature index outside the declared vector
    val badFeat = Model(1, 0.0, Seq(Tree(IndexedSeq(
      Internal(3, 0.5, 1, 2), Leaf(0.0), Leaf(1.0)))))
    intercept[IllegalArgumentException](deserialize(serialize(badFeat)))
  }

  test("loadFromStore round-trips the artifact through parquet") {
    val loaded = GbtArtifact.loadFromStore(spark, "gbt_v1")
    assert(loaded === model)
    // unknown model names fail loudly (empty scan → no head row)
    intercept[NoSuchElementException](GbtArtifact.loadFromStore(spark, "nope"))
  }
}
