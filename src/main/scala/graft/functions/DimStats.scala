package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}
import org.apache.spark.sql.expressions.Aggregator

/** Per-dimension moment/extrema buffer over an embedding column — a
  * typed Aggregator whose partial state is five fixed-width arrays
  * (count, sum, sum-of-squares, min, max per dimension), merged
  * element-wise (SURVEY.md §2.2 row 104).
  *
  * Versus `posexplode(embedding)` + groupBy(dim): the exploded form
  * shuffles rows × dim records (at 100 TB of 64-float embeddings,
  * a 64× row blow-up through the exchange); this buffer reduces
  * map-side to ONE state per partition, so the shuffle carries
  * partitions × 5 arrays no matter the corpus size — the vector
  * analogue of a partial-aggregated sum. Ragged and null rows are
  * tolerated: per-dimension counts track how many vectors actually
  * covered each dimension (buffers grow to the widest vector seen).
  */
object DimStats {

  /** (count, sum, sumsq, min, max) per dimension. */
  final case class Buf(n: Array[Long], sum: Array[Double],
                       sumsq: Array[Double], mn: Array[Double],
                       mx: Array[Double])

  /** One output row per dimension (1-based, matching unnest
    * ordinality); std is the SAMPLE standard deviation. */
  final case class DimRow(dim: Int, n: Long, mean: Double, std: Double,
                          mn: Double, mx: Double)

  final class Agg extends Aggregator[Seq[Float], Buf, Seq[DimRow]] {
    override def zero: Buf = Buf(Array.empty, Array.empty, Array.empty,
      Array.empty, Array.empty)

    private def grow(b: Buf, d: Int): Buf =
      if (b.n.length >= d) b
      else {
        val nb = Buf(java.util.Arrays.copyOf(b.n, d),
          java.util.Arrays.copyOf(b.sum, d),
          java.util.Arrays.copyOf(b.sumsq, d),
          java.util.Arrays.copyOf(b.mn, d),
          java.util.Arrays.copyOf(b.mx, d))
        var i = b.n.length
        while (i < d) {
          nb.mn(i) = Double.PositiveInfinity
          nb.mx(i) = Double.NegativeInfinity
          i += 1
        }
        nb
      }

    override def reduce(b0: Buf, v: Seq[Float]): Buf = {
      if (v == null) return b0
      val b = grow(b0, v.length)
      var i = 0
      val it = v.iterator
      while (it.hasNext) {
        val x = it.next().toDouble
        b.n(i) += 1
        b.sum(i) += x
        b.sumsq(i) += x * x
        if (x < b.mn(i)) b.mn(i) = x
        if (x > b.mx(i)) b.mx(i) = x
        i += 1
      }
      b
    }

    override def merge(a0: Buf, c: Buf): Buf = {
      val a = grow(a0, c.n.length)
      var i = 0
      while (i < c.n.length) {
        a.n(i) += c.n(i)
        a.sum(i) += c.sum(i)
        a.sumsq(i) += c.sumsq(i)
        if (c.mn(i) < a.mn(i)) a.mn(i) = c.mn(i)
        if (c.mx(i) > a.mx(i)) a.mx(i) = c.mx(i)
        i += 1
      }
      a
    }

    override def finish(b: Buf): Seq[DimRow] =
      (0 until b.n.length).map { i =>
        val n = b.n(i)
        val mean = if (n > 0) b.sum(i) / n else Double.NaN
        val variance =
          if (n > 1) math.max(0.0, (b.sumsq(i) - b.sum(i) * b.sum(i) / n) / (n - 1))
          else Double.NaN
        DimRow(i + 1, n, mean, math.sqrt(variance), b.mn(i), b.mx(i))
      }

    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[DimRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DimRow]]()
  }

  /** Column form for agg(...): one array-of-struct result to explode
    * into (dim, n, mean, std, mn, mx) rows. */
  def dimStats(emb: Column): Column =
    F.udaf(new Agg, org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[Float]]()).apply(emb)
}
