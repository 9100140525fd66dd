package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch: wall vs in-job time for q_recursive_union — is the cost
  * executor work or driver-side per-round planning? */
object RecursiveBreakdown {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val starts = new ConcurrentHashMap[Int, Long]()
    val jobNanos = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != 0L) jobNanos.addAndGet(System.nanoTime() - s)
      }
    })
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("q_recursive_union")
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    Thread.sleep(300)
    for (r <- 1 to 4) {
      jobs.set(0); jobNanos.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sf)
      val tPlan = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $r: wall=$dt%.3f s  fixpoint(driver fn)=${(tPlan - t0) / 1e9}%.3f s  in-job=${jobNanos.get() / 1e9}%.3f s  jobs=${jobs.get()}")
    }
    spark.stop()
  }
}
