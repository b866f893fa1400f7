package graft
import org.apache.spark.sql.SparkSession
/** Dev-only plan/latency probe (not part of the driver contract). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"[probe] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
