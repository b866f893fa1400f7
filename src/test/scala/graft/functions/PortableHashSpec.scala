package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen'd [[Md5Hash64Expr]] to the declarative chain it
  * replaced (r13 optimization): `conv(substring(md5(c), 1, 15), 16, 10)`
  * cast to long — the form the DuckDB oracles still spell out — must be
  * bit-equal on every input, because ~80 hash-gated call sites ride it.
  * Covers: ASCII, multi-byte UTF-8, empty string, digests whose top
  * nibble is ≥ 8 (sign handling of the big-endian read), interpreted
  * eval (via filter on a literal), and the JVM twin.
  */
class PortableHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def oldChain(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("Md5Hash64Expr equals the conv(substring(md5)) chain on varied inputs") {
    // deterministic corpus: short/long, ASCII/UTF-8/empty, plus numeric
    // strings of the sketch call-site shape
    val inputs = (0 until 2000).map(i => s"tok_$i") ++
      Seq("", "a", "é", "日本語テキスト", "mixed é 日本 ascii", " ", "\n", "0") ++
      (0 until 500).map(i => (i * 2654435761L).toString)
    val df = inputs.toDF("s")
      .withColumn("fast", Portable.md5Hash64($"s"))
      .withColumn("slow", oldChain($"s"))
    assert(df.filter($"fast" =!= $"slow" || $"fast".isNull).count() === 0)
    // the hash never overflows 60 bits
    assert(df.filter($"fast" < 0L || $"fast" >= (1L << 60)).count() === 0)
  }

  test("JVM twin matches the column form") {
    val inputs = Seq("", "abc", "é日本", "w1 w2 w3", "4920")
    val col = inputs.toDF("s")
      .select(Portable.md5Hash64($"s")).as[Long].collect()
    val jvm = inputs.map(Portable.md5Hash64Jvm)
    assert(col.toSeq === jvm)
  }

  test("null propagates") {
    val df = Seq[Option[String]](Some("x"), None).toDF("s")
      .select(Portable.md5Hash64($"s").as("h"))
    assert(df.filter($"h".isNull).count() === 1)
  }
}
