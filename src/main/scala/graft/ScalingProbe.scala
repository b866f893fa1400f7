package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}

/** Dev-only parallelism-evidence probe (r14, VERDICT r13 #6): at sf0.1
  * the 8-core vs 32-core wall ratios are ≈1 for almost every query, so
  * the bench cannot observe data parallelism at this SF. This probe
  * measures it directly: for each named query, one warm pass, then a
  * timed pass under a task listener recording task count and summed
  * executor run time. `par = Σ task-time / wall` is the achieved
  * parallelism; a query whose par tracks $SPARK_GRAFT_CPUS is
  * data-parallel (the flat wall ratio is fixed overhead, not a serial
  * plan). Not part of the driver contract.
  */
object ScalingProbe {
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
    val taskMs = new AtomicLong(); val nTasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        Option(t.taskMetrics).foreach { m =>
          taskMs.addAndGet(m.executorRunTime); nTasks.incrementAndGet()
        }
      }
    })
    names.foreach { n =>
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save() // warm
      org.apache.spark.graft.corebridge.drainListenerBus(spark.sparkContext)
      taskMs.set(0L); nTasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      org.apache.spark.graft.corebridge.drainListenerBus(spark.sparkContext)
      println(f"[scale] $n cpus=$cpus wall=${wallMs}%.0fms tasks=${nTasks.get}%d " +
        f"taskSum=${taskMs.get}%dms par=${taskMs.get / wallMs}%.2f")
    }
    spark.stop()
  }
}
