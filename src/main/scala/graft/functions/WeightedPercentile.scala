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
  * Exact percentiles buffer all (value, weight) pairs; at 100 TB use a
  * weighted quantile sketch instead — this Aggregator is the extension
  * point where that sketch would slot in.
  */
final case class WP(value: Double, weight: Double)

class WeightedPercentile(p: Double) extends Aggregator[WP, Seq[WP], Double] {
  override def zero: Seq[WP] = Seq.empty
  override def reduce(buf: Seq[WP], in: WP): Seq[WP] = buf :+ in
  override def merge(a: Seq[WP], b: Seq[WP]): Seq[WP] = a ++ b
  override def finish(buf: Seq[WP]): Double = {
    if (buf.isEmpty) return Double.NaN
    val sorted = buf.sortBy(_.value)
    val total = sorted.iterator.map(_.weight).sum
    val target = p * total
    var cum = 0.0
    sorted.find { wv => cum += wv.weight; cum >= target }
      .getOrElse(sorted.last).value
  }
  override def bufferEncoder: Encoder[Seq[WP]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WP]]()
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
