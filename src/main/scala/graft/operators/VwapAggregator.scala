package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed VWAP as a Dataset `Aggregator[(price, volume), ...]` — the
  * UDAF surface (SURVEY.md §7.6): zero/reduce/merge is the exact
  * partial-aggregation contract Catalyst runs (map-side partials,
  * shuffle one buffer per group per partition, merge). Registered
  * through `functions.udaf` it drops into untyped `groupBy().agg()`
  * next to built-ins.
  *
  * The built-in `sum(price*vol)/sum(vol)` formulation stays the
  * preferred plan (fully codegen'd); this demonstrates — and tests —
  * the extension point a custom statistic that CAN'T be composed from
  * built-ins would use.
  */
object VwapAggregator extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
