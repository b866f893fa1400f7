package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only per-job breakdown (guide §7.1 without a UI): runs a query
  * once warm, then logs every Spark job's wall time, stage count and
  * callsite during a second run. Not part of the driver contract.
  */
object JobLogProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm pass (codegen, silvers, parquet footers)
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val total = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          j.stageInfos.sortBy(_.stageId).lastOption.map(_.name.take(70)).getOrElse("?"),
          j.stageInfos.size))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, cs, nst) =>
          val ms = (System.nanoTime() - t0) / 1e6
          total.addAndGet(ms.toLong)
          if (ms >= 100)
            println(f"[job] ${j.jobId}%3d $ms%8.0f ms stages=$nst%2d $cs")
        }
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    org.apache.spark.graft.corebridge.drainListenerBus(spark.sparkContext)
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s wall," +
      f" ${total.get() / 1e3}%.2f s summed over ${starts.size} jobs")
    spark.stop()
  }
}
