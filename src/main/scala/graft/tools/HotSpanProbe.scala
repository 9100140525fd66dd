package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the r11 skew fix (VERDICT r10 "What's wrong" #2):
  * plants ONE span hash with 10^5 occurrences (the viral-boilerplate
  * shape exact-substring dedup exists to kill) next to a unique-text
  * corpus and times Dedup.removeDuplicateSpans end-to-end. Before the
  * fix, the row_number window concentrated all 10^5 occurrences in a
  * single task; the two-phase min-struct rewrite collapses them
  * map-side. Usage: HotSpanProbe [hotDocs] [uniqueDocs] [runs] */
object HotSpanProbe {
  def main(args: Array[String]): Unit = {
    val hot = if (args.length > 0) args(0).toInt else 100000
    val uniq = if (args.length > 1) args(1).toInt else 100000
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // hot docs all share one 8-token span; unique docs never collide
    val docs = spark.range(hot + uniq).selectExpr(
      "id as doc_id",
      s"""case when id < $hot
            then 'the same viral boilerplate span repeats here verbatim'
            else concat('u', id, ' v', id, ' w', id, ' x', id,
                        ' y', id, ' z', id, ' p', id, ' q', id)
          end as text""")
    docs.write.mode("overwrite").parquet("/tmp/hotspan_docs")
    val stored = spark.read.parquet("/tmp/hotspan_docs")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      graft.ops.Dedup.removeDuplicateSpans(stored, 8)
        .write.format("noop").mode("overwrite").save()
      println(f"[hotspan] run $i (hot=$hot uniq=$uniq): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
