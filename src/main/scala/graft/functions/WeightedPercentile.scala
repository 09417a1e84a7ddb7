package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact weighted discrete percentile as an `Aggregator` UDAF — covers
  * the reference's `approx_percentile_cont_with_weight` surface
  * (SURVEY.md §2.7 approx row: "weighted percentile needs a small custom
  * Aggregator") with exact semantics: the smallest value whose cumulative
  * weight reaches p of the total (equivalently, quantile_disc over the
  * weight-expanded multiset — DuckDB-oracle compatible).
  *
  * The buffer is a value -> total-weight map, so state is O(distinct
  * values) rather than O(rows) — constant-size for bounded-cardinality
  * columns regardless of input scale, and tiny to shuffle on merge. For
  * unbounded high-cardinality doubles swap in a weighted quantile
  * sketch — this Aggregator is that extension point.
  */
final case class WP(value: Double, weight: Double)

class WeightedPercentile(p: Double)
    extends Aggregator[WP, scala.collection.mutable.HashMap[Double, Double], Double] {
  type Buf = scala.collection.mutable.HashMap[Double, Double]
  override def zero: Buf = scala.collection.mutable.HashMap.empty
  override def reduce(buf: Buf, in: WP): Buf = {
    buf.update(in.value, buf.getOrElse(in.value, 0.0) + in.weight); buf
  }
  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (v, w) => a.update(v, a.getOrElse(v, 0.0) + w) }; a
  }
  override def finish(buf: Buf): Double = {
    if (buf.isEmpty) return Double.NaN
    val sorted = buf.toArray.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = p * total
    var cum = 0.0
    sorted.find { case (_, w) => cum += w; cum >= target }
      .getOrElse(sorted.last)._1
  }
  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedPercentile {
  /** Register `weighted_percentile_<pct>` for the given fractions. */
  def register(spark: SparkSession, fractions: Seq[Double]): Unit =
    fractions.foreach { p =>
      val name = s"weighted_percentile_${(p * 100).round}"
      spark.udf.register(name, udaf(new WeightedPercentile(p)))
    }
}
