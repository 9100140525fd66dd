package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
/** Scratch probe: JSON extraction formulations (test scope). */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    def exec(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); exec(df); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[json] $name%-22s ${ts(2)}%.3f s")
    }
    // current operator shape: project get_json_object, filter on alias
    time("current") {
      ev.selectExpr("event_id",
        "cast(get_json_object(props, '$.k') as bigint) as k")
        .filter("k is not null and k % 10 = 0")
    }
    // parse-once barrier: no pushdown duplication
    time("no_filter") {
      ev.selectExpr("event_id",
        "cast(get_json_object(props, '$.k') as bigint) as k")
    }
    time("from_json") {
      ev.selectExpr("event_id",
        "from_json(props, 'k BIGINT').k as k")
        .filter("k is not null and k % 10 = 0")
    }
    time("variant") {
      ev.selectExpr("event_id",
        "cast(variant_get(parse_json(props), '$.k') as bigint) as k")
        .filter("k is not null and k % 10 = 0")
    }
    time("from_json_once") {
      ev.selectExpr("event_id", "from_json(props, 'k BIGINT') as __j")
        .selectExpr("event_id", "__j.k as k")
        .filter("k is not null and k % 10 = 0")
    }
    spark.stop()
  }
}
