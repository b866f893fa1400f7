package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted plan of a query's PRE-MATERIALIZE
  * result (the plan Scoped.materialize hides behind a FileScan), via the
  * Scoped.lastMaterializedPlan debug hook after one execution. Not part
  * of the driver contract.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    println("==== last materialized input plan ====")
    println(graft.operators.Scoped.lastMaterializedPlan)
    spark.stop()
  }
}
