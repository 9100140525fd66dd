package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: PassJoin candidate-stream size for the q_edit_pairs
  * bench fixture at a given SF dir — the blocking-selectivity number
  * the r7/r8 verdicts adjudicate. */
object CandCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val fixture = spark.read.parquet(s"$dir/customer.parquet")
      .filter("c_custkey % 10 = 0")
    val n = graft.ops.Dedup.editCandidates(fixture, "c_custkey", "c_name", 2)
      .count()
    println(s"[candcount] candidates = $n")
    spark.stop()
  }
}
