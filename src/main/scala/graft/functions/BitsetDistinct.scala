package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct count over a dense non-negative long key via bitmap
  * merge — a custom typed Aggregator (the guide's tier for stateful
  * buffer aggregates, same shape a sketch/HLL buffer would use).
  *
  * Versus COUNT(DISTINCT): Spark plans count-distinct as an Expand +
  * two-phase aggregate, shuffling one row per distinct (group, key)
  * pair; this aggregator's partial state is a fixed bitmap per group
  * that merges with bitwise OR, so the shuffle carries one buffer per
  * (partition, group) regardless of key cardinality. Appropriate when
  * keys are dense ids bounded by `maxKey` (e.g. user ids) — the
  * dense-id analogue of a roaring-bitmap distinct.
  *
  * Memory contract: each group's buffer is maxKey/8 bytes on every
  * producing partition (maxKey = 2^20 → 128 KiB per group per
  * partition). Size maxKey to the true key-space bound and keep group
  * counts modest; for sparse or unbounded key spaces use COUNT
  * (DISTINCT) or a sketch instead — this aggregator trades memory for
  * an exact, shuffle-light answer only where ids are dense.
  */
object BitsetDistinct {

  final class Agg(maxKey: Int) extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long]((maxKey >> 6) + 1)

    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      if (key >= 0 && key <= maxKey)
        b((key >> 6).toInt) |= (1L << (key & 63))
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Long = {
      var n = 0L
      var i = 0
      while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
      n
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form usable in groupBy().agg(...). */
  def distinctCount(keyCol: Column, maxKey: Int): Column =
    F.udaf(new Agg(maxKey), Encoders.scalaLong).apply(keyCol)
}
