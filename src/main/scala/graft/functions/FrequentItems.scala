package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; the mergeable
  * summaries form of Agarwal et al., PODS 2012) as a typed Spark
  * `Aggregator`: at most `capacity` counters of bounded size per partial
  * buffer, whatever the column's true cardinality — the thing you run when
  * the exact `groupBy` count table itself is too big to shuffle, but you
  * only need the items above a frequency threshold.
  *
  * Guarantees (n = rows aggregated, k = capacity): every item with true
  * count > n/(k+1) surfaces; each reported estimate is an UNDERCOUNT with
  * `true - n/(k+1) <= estimate <= true`. When the true distinct count is
  * <= k no decrement ever fires and every estimate is EXACT — which is
  * what makes the contract query oracle-checkable against a plain
  * group-by.
  *
  * Scale shape: per-partition buffers hold <= k entries (reduce is the
  * classic decrement-all-on-overflow; merge is pointwise-add then subtract
  * the (k+1)-th largest and drop non-positives), so partial aggregation
  * ships k-bounded state per partition instead of a cardinality-bounded
  * hash map — the shuffle is k × partitions rows, independent of data
  * volume. Buffers ride an `ObjectHashAggregate` (typed aggregates are
  * never codegen'd; the bounded state, not codegen, is the point here).
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(capacity >= 1, "MisraGries requires capacity >= 1")

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(buf: mutable.HashMap[String, Long],
             item: String): mutable.HashMap[String, Long] = {
    if (item == null) return buf
    buf.get(item) match {
      case Some(c) => buf(item) = c + 1L
      case None if buf.size < capacity => buf(item) = 1L
      case None =>
        // full + unseen item: decrement every counter, drop zeros, and
        // DISCARD the item (classic MG — the item is "paid for" by the
        // global decrement, which is what bounds the undercount)
        for (key <- buf.keys.toList) {
          val nc = buf(key) - 1L
          if (nc == 0L) buf.remove(key) else buf(key) = nc
        }
    }
    buf
  }

  def merge(b1: mutable.HashMap[String, Long],
            b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((k, v) <- b2) b1(k) = b1.getOrElse(k, 0L) + v
    if (b1.size > capacity) {
      // subtract the (k+1)-th largest count from every counter and keep
      // the positive ones: <= k survive, and the subtraction charges every
      // dropped item's full residual (Agarwal et al.'s merge rule, which
      // preserves the n/(k+1) error bound under arbitrary merge trees)
      val d = b1.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      for (key <- b1.keys.toList) {
        val nc = b1(key) - d
        if (nc <= 0L) b1.remove(key) else b1(key) = nc
      }
    }
    b1
  }

  def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] = buf.toMap

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
