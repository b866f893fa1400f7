package graft
import org.apache.spark.sql.SparkSession

/** Dev-only phase-attribution probe (guide §1/§7.3): for each named
  * query, split wall time into BUILD (builder runs, incl. any eager
  * materialize/shared actions), PLAN (analysis+optimization+physical
  * planning of the final frame), and EXEC (noop write of the planned
  * frame, incl. codegen). Three rounds; read the MIN of rounds 2-3 per
  * phase — round 1 absorbs Janino/JIT warmup. Not part of the driver
  * contract.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long) = (System.nanoTime() - t0) / 1e6
    names.foreach { n =>
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        val build = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analyze+optimize+plan
        val plan = ms(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val exec = ms(t2)
        println(f"[phase] $n round$round build=$build%.0fms plan=$plan%.0fms exec=$exec%.0fms")
      }
    }
    spark.stop()
  }
}
