package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Misra–Gries heavy-hitters sketch as a typed Aggregator — the
  * bounded-state scale path for "top grams / domains / tokens over an
  * unbounded key space".
  *
  * The exact form (one row per distinct key through a hash shuffle,
  * see TextAnalysis.topNgrams) is the right plan while distinct keys
  * fit a shuffle; at 100 TB a token-n-gram key space does not. This
  * sketch keeps AT MOST `k` counters per partial: each partition
  * summarizes locally (classic MG decrement-all step), partials merge
  * by counter-sum then subtract-the-(k+1)-th-largest — so the shuffle
  * carries k rows per partition NO MATTER the corpus cardinality.
  *
  * Guarantees (standard MG bounds, preserved by this merge): reported
  * counts are LOWER bounds undercounting by at most n/(k+1) of the
  * n items seen, and every key with true frequency > n/(k+1) is
  * present in the output. With k larger than the number of distinct
  * keys no decrement ever fires and the counts are EXACT — which is
  * how the DuckDB oracle checks the operator end-to-end while specs
  * pin the eviction-regime guarantees on planted data.
  *
  * The buffer is an immutable Map (one persistent-map update per
  * row); a production build would swap an open-addressing mutable
  * buffer behind the same Aggregator contract — the plan shape and
  * guarantees are identical.
  */
object HeavyHitters {

  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "sketch size must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c)            => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          // decrement-all: every counter pays one for the unseen key,
          // zeroed counters drop out (the key itself is discarded)
          b.flatMap { case (g, c) =>
            if (c > 1) Some(g -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (g, c)) =>
        m.updated(g, m.getOrElse(g, 0L) + c) }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everyone; at most
        // k counters can exceed it, and the MG error bound composes
        val cut = sum.valuesIterator.toArray.sorted(
          Ordering[Long].reverse).apply(k)
        sum.flatMap { case (g, c) =>
          if (c > cut) Some(g -> (c - cut)) else None }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form usable in agg(...): a map of key → count lower
    * bound, at most `k` entries. */
  def misraGries(keyCol: Column, k: Int): Column =
    F.udaf(new MisraGries(k), Encoders.STRING).apply(keyCol)
}
