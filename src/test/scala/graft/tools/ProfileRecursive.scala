package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch profiler: counts Spark jobs and wall time for
  * q_recursive_union at the bench session settings. */
object ProfileRecursive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 << 20).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val d = js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        descs.add(s"${js.stageInfos.length}stg $d")
      }
    })
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("q_recursive_union")
    // warmup
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    Thread.sleep(200)
    for (r <- 1 to 3) {
      jobs.set(0); descs.clear()
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"round $r: $dt%.3f s, jobs=${jobs.get()}")
    }

    // r5-style loop inlined (eager ckpt + isEmpty per round), same
    // walk closure, for a same-box comparison
    import org.apache.spark.sql.{functions => F, DataFrame}
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("nation")
    def r5Loop(): DataFrame = {
      var result = spark.sql(
        "select cast(n_nationkey as int) as k from nation where n_nationkey=0")
        .distinct().localCheckpoint(true)
      var working = result
      var done = working.isEmpty
      var iter = 0
      while (!done) {
        iter += 1
        var next = working.selectExpr("cast((k*2+3)%11 as int) as k")
          .distinct().except(result).localCheckpoint(true)
        if (next.isEmpty) done = true
        else {
          result = result.union(next)
          if (iter % 8 == 0) result = result.localCheckpoint(true)
          working = next
        }
      }
      result
    }
    def r7Loop(): DataFrame = {
      var blocks = List(spark.sql(
        "select cast(n_nationkey as int) as k from nation where n_nationkey=0")
        .distinct().localCheckpoint(false))
      var working = blocks.head
      var done = blocks.head.count() == 0
      var iter = 0
      while (!done) {
        iter += 1
        // except IS distinct (ReplaceExceptWithAntiJoin wraps the
        // anti-join in Distinct) — no separate exchange needed
        val next = working.selectExpr("cast((k*2+3)%11 as int) as k")
          .except(blocks.reduce(_ union _)).localCheckpoint(false)
        if (next.count() == 0) done = true
        else {
          blocks = blocks :+ next
          if (iter % 8 == 0)
            blocks = List(blocks.reduce(_ union _).localCheckpoint(false))
          working = next
        }
      }
      blocks.reduce(_ union _)
    }
    for (r <- 1 to 3) {
      jobs.set(0)
      val t0 = System.nanoTime()
      r5Loop().write.format("noop").mode("overwrite").save()
      println(f"r5loop $r: ${(System.nanoTime() - t0) / 1e9}%.3f s, jobs=${jobs.get()}")
    }
    for (r <- 1 to 3) {
      jobs.set(0)
      val t0 = System.nanoTime()
      r7Loop().write.format("noop").mode("overwrite").save()
      println(f"r7loop $r: ${(System.nanoTime() - t0) / 1e9}%.3f s, jobs=${jobs.get()}")
    }
    spark.stop()
  }
}
