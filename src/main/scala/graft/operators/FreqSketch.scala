package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory frequent-items (heavy-hitter) sketch: Misra-Gries
  * with `k` counters, as a typed `Aggregator` so it drops into
  * `groupBy().agg()` via `functions.udaf` (the §2.10 extension surface,
  * like [[VwapAggregator]]).
  *
  * Why a sketch: "top sellers over 100 TB of events" via exact
  * `groupBy(item).count()` shuffles every distinct item; the
  * Misra-Gries summary caps state at `k` counters PER PARTIAL — the
  * partial-aggregation contract (zero/reduce/merge) Catalyst already
  * runs means map-side partials stay bounded and only k-entry maps
  * cross the shuffle, like `approx_count_distinct`'s HLL registers.
  *
  * Guarantees (mergeable-summaries form, Agarwal et al., PODS'12):
  * with true count c(x) over N rows, the sketch estimate ĉ(x) satisfies
  * `c(x) − N/(k+1) ≤ ĉ(x) ≤ c(x)`, so every x with `c(x) > N/(k+1)`
  * is present in the output — no false negatives above the threshold.
  * When the column's true cardinality is ≤ k no decrement ever fires
  * and every count is EXACT (what the q_heavy_hitters gate exploits to
  * hash-match the DuckDB GROUP BY oracle).
  *
  * The merge rule (sum counters, then subtract the (k+1)-th largest
  * count from all and drop the non-positive) is the associative,
  * error-additive combination from the mergeable-summaries paper —
  * NOT a rescan, so any partial/merge tree Catalyst picks yields the
  * same bound.
  */
object FreqSketch {

  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "MisraGries: k must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c)              => b.updated(x, c + 1)
        case None if b.size < k   => b.updated(x, 1L)
        // classic MG step: a miss with a full table decrements every
        // counter (the new item and one unit of each survivor "cancel")
        case None =>
          b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
      }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val summed = b2.foldLeft(b1) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count — the smallest offset
        // that compacts back to ≤ k entries
        val m = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (key, c) => if (c - m > 0) Some(key -> (c - m)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
