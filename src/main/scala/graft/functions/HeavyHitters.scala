package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a typed `Aggregator` — the
  * bounded-state path to corpus heavy hitters where an exact word count
  * would shuffle the full vocabulary.
  *
  * Classic guarantees with k counters over n items (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012):
  *  - every item with true count > n/(k+1) is IN the summary;
  *  - for every tracked item: est ≤ true ≤ est + n/(k+1).
  *
  * The summary is a candidate GENERATOR, not an exact answer — merge order
  * changes the surviving counts (not the coverage guarantee). The engine's
  * registered query therefore runs the standard two-pass form: MG candidates
  * (this aggregator, fixed O(k) state, associative merge) → broadcast
  * semi-join → exact count of candidates only → threshold filter. The final
  * output is deterministic and fully DuckDB-oracle-checkable; the
  * order-dependent sketch internals are bounded by HeavyHittersSpec instead.
  */
object HeavyHitters {

  /** Summary entry count. 40 > the 31-word synthetic vocabulary, so the
    * registered corpus query tracks exactly; eviction paths are spec-tested
    * with k << distinct. */
  val K = 40

  def aggregator(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      override def zero: Map[String, Long] = Map.empty

      override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
        buf.get(item) match {
          case Some(c) => buf.updated(item, c + 1)
          case None if buf.size < k => buf.updated(item, 1L)
          // all counters occupied: decrement everyone, drop zeros (the
          // arriving item is "absorbed" by the k decrements)
          case None => buf.iterator
            .collect { case (i, c) if c > 1 => i -> (c - 1) }.toMap
        }

      /** Mergeable-summaries merge: sum counts, then if over k entries
        * subtract the (k+1)-th largest count from all and drop ≤0. */
      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val summed = b.foldLeft(a) { case (acc, (i, c)) =>
          acc.updated(i, acc.getOrElse(i, 0L) + c)
        }
        if (summed.size <= k) summed
        else {
          val kth = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
          summed.iterator
            .collect { case (i, c) if c > kth => i -> (c - kth) }.toMap
        }
      }

      override def finish(buf: Map[String, Long]): Map[String, Long] = buf

      override def bufferEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder[Map[String, Long]]()
      override def outputEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder[Map[String, Long]]()
    }
}
