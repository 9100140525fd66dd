package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Round-5 chunking + split assignment (SURVEY §2.2 rows 84-85). */
class ChunkSplitSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")

  test("chunks cover every token with the configured overlap") {
    import spark.implicits._
    val one = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(one, size = 4, stride = 3)
      .orderBy("chunk_id").collect()
    // 10 tokens, stride 3 -> starts 0,3,6,9 -> 4 chunks
    assert(chunks.length == 4)
    assert(chunks.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(chunks.map(_.getAs[Int]("n_tokens")).toSeq == Seq(4, 4, 4, 1))
  }

  test("NULL text yields zero chunks; empty text yields one") {
    import spark.implicits._
    val d = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(d, 4, 3).collect()
    assert(chunks.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("chunking reassembles the document when stride == size") {
    val reassembled = TextAnalysis.chunkDocuments(docs, 64, 64)
      .groupBy("doc_id")
      .agg(F.array_join(F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("chunk_id"),
          F.col("chunk_text")))), s => s.getField("chunk_text")), " ")
        .as("text2"))
    val joined = docs.filter("text is not null")
      .join(reassembled, "doc_id")
      .filter("text <> text2")
    assert(joined.isEmpty)
  }

  test("split assignment is exhaustive, deterministic, and boundary-stable") {
    val s1 = Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == docs.count())
    // roughly proportional at 500 docs
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // growing train only ABSORBS from val across the moved boundary:
    // every train row at 0.8 is still train at 0.9
    val s2 = Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val lost = s1.filter("split = 'train'").select("doc_id")
      .except(s2.filter("split = 'train'").select("doc_id"))
    assert(lost.isEmpty)
  }

  test("split fractions over 1 fail loudly") {
    val e = intercept[IllegalArgumentException](
      Sampling.splitAssign(docs, "doc_id",
        Seq("a" -> 0.8, "b" -> 0.4)))
    assert(e.getMessage.contains("sum"))
  }
}
