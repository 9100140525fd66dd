package graft.ops

import graft.SparkTestBase
import graft.functions.BloomUtil
import org.apache.spark.sql.{functions => F}

/** Round-5 Bloom-prefiltered incremental dedup (SURVEY §2.2 row 83). */
class BloomSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")

  test("bloom-prefiltered dedup result equals the exact anti-join") {
    val inc = docs.filter("doc_id % 7 = 0")
    val corpus = docs.filter("doc_id % 7 <> 0")
    assertSameRows(
      Dedup.bloomIncrementalDedup(inc, corpus),
      Dedup.incrementalDedup(inc, corpus))
  }

  test("an undersized (high-fp) filter still gives the exact result") {
    // 64 bits for hundreds of corpus keys: nearly every probe is a
    // false positive, everything flows through exact verification —
    // sizing affects COST only, never the answer
    val inc = docs.filter("doc_id % 7 = 0")
    val corpus = docs.filter("doc_id % 7 <> 0")
    assertSameRows(
      Dedup.bloomIncrementalDedup(inc, corpus, bits = 64, k = 2),
      Dedup.incrementalDedup(inc, corpus))
  }

  test("BloomUtil has no false negatives and a sane fp rate") {
    val bits = 1 << 16
    val k = 5
    val words = new Array[Long](BloomUtil.wordCount(bits))
    val inserted = (0 until 2000).map(i => i * 2654435761L + 17)
    inserted.foreach(h => BloomUtil.set(words, h, k))
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(words)
    assert(inserted.forall(h => BloomUtil.contains(arr, h, k)))
    val probes = (0 until 10000).map(i => i * 7046029254386353131L - 3)
      .filterNot(inserted.contains)
    val fp = probes.count(h => BloomUtil.contains(arr, h, k))
    // 2000 keys in 65536 bits, k=5 → theoretical fp ~0.5%; allow 3%
    assert(fp < probes.length * 0.03, s"fp rate too high: $fp/${probes.length}")
  }

  test("graft_bloom_contains is callable from SQL over a built filter") {
    graft.functions.GraftFunctions.register(spark)
    val bloom = docs.filter("doc_id < 100")
      .agg(BloomUtil.build(
        F.conv(F.md5(F.col("text")).substr(1, 15), 16, 10).cast("long"),
        1 << 16, 5).as("bf"))
    val probed = docs
      .withColumn("h",
        F.conv(F.md5(F.col("text")).substr(1, 15), 16, 10).cast("long"))
      .crossJoin(F.broadcast(bloom))
      .selectExpr("doc_id", "graft_bloom_contains(bf, h, 5) as maybe")
    // every doc actually in the filter must probe true
    assert(probed.filter("doc_id < 100 and not maybe").isEmpty)
  }
}
