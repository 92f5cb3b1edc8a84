package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed (`Dataset[T]`) surface: case-class row views + typed Aggregators
  * for the `typed_agg` query. Typed views are used only where type safety
  * helps (custom aggregation logic); scans/filters stay in the untyped
  * Column API so Catalyst pushdown is preserved (a lambda filter would be
  * opaque to the optimizer — see SURVEY §1.2).
  */
case class LineQty(l_returnflag: String, l_quantity: Double, l_tax: Double)

/** Exact sum of the 2-dp quantity via a long cents buffer — associative
  * and overflow-safe to ~9×10^16 cents, so the partial/final split can't
  * change the result (same guarantee as Det.dsum, typed edition). */
object QtyCentsSum extends Aggregator[LineQty, Long, Double] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: LineQty): Long =
    b + math.round(a.l_quantity * 100)
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(b: Long): Double = b / 100.0
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Max tax-inclusive quantity — a typed aggregator whose input is the
  * whole row, showing per-row derived logic inside the reduce. */
object MaxCharge extends Aggregator[LineQty, Double, Double] {
  override def zero: Double = Double.NegativeInfinity
  override def reduce(b: Double, a: LineQty): Double =
    math.max(b, a.l_quantity * (1.0 + a.l_tax))
  override def merge(a: Double, b: Double): Double = math.max(a, b)
  override def finish(b: Double): Double = b
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
