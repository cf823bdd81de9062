package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom aggregate (SURVEY.md §2d `agg_udaf`): weighted mean
  * sum(value*weight)/sum(weight) as a typed `Aggregator`.
  *
  * The buffer is a pair of partial sums, so the aggregate is fully
  * mergeable — Spark runs it as partial (map-side) + final aggregation
  * exactly like a built-in, which is the property that matters at
  * 100 TB: no per-group row shipping, only two doubles per group cross
  * the shuffle.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
