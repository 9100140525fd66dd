package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing (SURVEY.md §2.2 row 48).
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * beside them — the 100 TB-friendly shape: payloads stay columnar in
  * parquet, metadata predicates prune without touching bytes, and
  * decode runs batched per partition with bounded memory.
  *
  * The container ships no image/audio codecs, so `decodeBatch` is a
  * clearly-marked deterministic stub: the Spark-side plumbing
  * (schema, encoder boundaries, partition batching, feature shape) is
  * real and tested; swapping in a true decoder changes only the stub
  * body.
  */
object Multimodal {

  final case class Asset(doc_id: Long, payload: Array[Byte],
                         source: String, n_chars: Long)
  final case class AssetFeatures(doc_id: Long, n_bytes: Long,
                                 width: Long, height: Long, n_frames: Long)

  /** Documents as binary assets (text bytes stand in for media
    * payloads in the synthetic corpus). */
  def assets(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "cast(text as binary) as payload",
      "source", "n_chars")

  /** STUB decode kernel — deterministic fake features derived from
    * payload length. A real build replaces this body with an image /
    * audio / video decode; the signature (bytes in, features out,
    * batch-at-a-time) is the production contract. */
  def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
    batch.map { a =>
      val len = a.payload.length.toLong
      AssetFeatures(a.doc_id, len, len % 640, (len * 7) % 480, len % 30 + 1)
    }

  /** Batched per-partition decode: the Scala analogue of a pandas
    * `mapInPandas` UDF — partitions stream through in fixed-size
    * batches so decoder memory stays bounded regardless of partition
    * size. */
  def decodeFeatures(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds: Dataset[Asset] = assets(docs).as[Asset]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq))
    }.toDF()
  }

  /** STUB resize kernel: a real build decodes, resamples, re-encodes;
    * the stub deterministically truncates/pads payload bytes to the
    * target "resolution" so downstream schema/size contracts are
    * exercised for real. */
  def resizeBatch(batch: Seq[Asset], targetBytes: Int): Seq[Asset] =
    batch.map { a =>
      val out = java.util.Arrays.copyOf(a.payload, targetBytes)
      a.copy(payload = out)
    }

  /** Batched per-partition resize — same mapPartitions shape as
    * `decodeFeatures`. */
  def resize(docs: DataFrame, targetBytes: Int, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    assets(docs).as[Asset].mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => resizeBatch(g.toSeq, targetBytes))
    }.toDF()
  }

  /** STUB frame sampling: emits every `stride`-th "frame offset" of a
    * video payload (fake frames = fixed-size byte windows). One output
    * row per sampled frame — the explode-shaped contract a real
    * decoder would follow. */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 32,
                   stride: Int = 4): DataFrame =
    assets(docs).selectExpr("doc_id",
      s"""posexplode(transform(
            sequence(0, greatest(length(payload) div ($frameBytes * $stride) - 1, 0)),
            i -> i * $frameBytes * $stride)) as (frame_idx, byte_offset)""")

  /** Pure-SQL metadata features (same formulas as the stub kernel) —
    * used as the oracle-comparable surface and as the expected value
    * for the mapPartitions plumbing test. */
  def metaFeatures(docs: DataFrame): DataFrame =
    assets(docs).selectExpr("doc_id",
      "cast(length(payload) as bigint) as n_bytes",
      "cast(length(payload) % 640 as bigint) as width",
      "cast((length(payload) * 7) % 480 as bigint) as height",
      "cast(length(payload) % 30 + 1 as bigint) as n_frames")
}
