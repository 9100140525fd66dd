package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Misra–Gries heavy-hitters sketch: exact in the no-eviction regime,
  * MG bounds under eviction, bounds preserved across partial merges. */
class HeavyHittersSpec extends SparkTestBase {

  private def sketch(items: Seq[String], k: Int,
                     partitions: Int = 1): Map[String, Long] = {
    import spark.implicits._
    items.toDF("g").repartition(partitions)
      .agg(HeavyHitters.misraGries(F.col("g"), k).as("mg"))
      .select(F.explode(F.col("mg")).as(Seq("g", "c")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("no eviction (k >= distinct keys) means exact counts") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    assert(sketch(items, k = 8) == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("heavy keys survive eviction with counts within the MG bound") {
    // 60 a's + 30 b's + 40 singletons; n = 130, k = 4 -> error <= 26
    val rare = (1 to 40).map(i => s"r$i")
    val items = scala.util.Random.shuffle(
      Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ rare)
    val mg = sketch(items, k = 4)
    val n = items.size
    val bound = n / (4 + 1)
    // every key with true frequency > n/(k+1) = 26 must be present
    assert(mg.contains("a"))
    assert(mg.contains("b"))
    // estimates are lower bounds within the error
    assert(mg("a") <= 60 && mg("a") >= 60 - bound)
    assert(mg("b") <= 30 && mg("b") >= 30 - bound)
    assert(mg.size <= 4)
  }

  test("partial-sketch merges keep the guarantee (multi-partition)") {
    val rare = (1 to 50).map(i => s"r$i")
    val items = scala.util.Random.shuffle(
      Seq.fill(80)("x") ++ Seq.fill(40)("y") ++ rare)
    val mg = sketch(items, k = 5, partitions = 8)
    val bound = items.size / (5 + 1) // 28
    assert(mg.contains("x") && mg("x") <= 80 && mg("x") >= 80 - bound)
    assert(mg.contains("y") && mg("y") <= 40 && mg("y") >= 40 - bound)
    assert(mg.size <= 5)
  }

  test("approxTopNgrams equals exact topNgrams occurrences when sized up") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val approx = graft.ops.TextAnalysis
      .approxTopNgrams(docs, 2, 10, sketch = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = graft.ops.TextAnalysis.topNgrams(docs, 2, 10)
      .select("g", "n_occ")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(approx == exact)
  }
}
