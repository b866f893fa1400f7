package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (Test/parallelExecution=false). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Sf001 = "/root/testdata/sf0.001"
}
