package graft.tools
import org.apache.spark.sql.SparkSession
object Q5Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_tpch_q5", "q_tpch_q3")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
      val p = df.queryExecution.executedPlan.toString()
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
        .findAllIn(p).toList.groupBy(identity).view.mapValues(_.size).toMap
    println(s"$q joins=$joins exchanges=" +
      "Exchange".r.findAllIn(p).length)
    }
    spark.stop()
  }
}
