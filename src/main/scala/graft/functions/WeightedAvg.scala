package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** §2.11 `agg_udaf`: typed weighted average as an `Aggregator`.
  *
  * The buffer keeps exact decimal partial sums (inputs are generated with
  * <= 2 decimal digits, so `BigDecimal.valueOf(double)` — shortest decimal
  * representation — recovers the intended value exactly; products are
  * exact at 4 dp). Decimal addition is associative+commutative, so the
  * result is independent of Spark's partial/final aggregation split — the
  * property that makes this UDAF safe on a 1000-executor cluster, and
  * hash-comparable with DuckDB's `SUM(CAST(... AS DECIMAL))`.
  *
  * finish() divides the two correctly-rounded doubles, mirroring the
  * oracle's `CAST(SUM(..) AS DOUBLE) / CAST(SUM(..) AS DOUBLE)`.
  */
case class WAvgIn(w: Double, x: Double)
case class WAvgBuf(num: JBigDecimal, den: JBigDecimal)

object WeightedAvg extends Aggregator[WAvgIn, WAvgBuf, Double] {
  private def d(v: Double): JBigDecimal = JBigDecimal.valueOf(v)
  override def zero: WAvgBuf = WAvgBuf(JBigDecimal.ZERO, JBigDecimal.ZERO)
  override def reduce(b: WAvgBuf, a: WAvgIn): WAvgBuf =
    WAvgBuf(b.num.add(d(a.w).multiply(d(a.x))), b.den.add(d(a.w)))
  override def merge(b1: WAvgBuf, b2: WAvgBuf): WAvgBuf =
    WAvgBuf(b1.num.add(b2.num), b1.den.add(b2.den))
  override def finish(b: WAvgBuf): Double =
    if (b.den.signum() == 0) Double.NaN
    else b.num.doubleValue() / b.den.doubleValue()
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** column-level handle: weighted_avg(weight, value) */
  val fn = udaf(WeightedAvg, Encoders.product[WAvgIn])
  def apply(w: Column, x: Column): Column = fn(w, x)
}
