package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** flat cell array, mutated in place inside a partition (the standard
  * typed-aggregator trick — Encoders.product serializes it as ArrayType
  * only at partial/merge boundaries) */
case class CMBuf(cells: Array[Long])

/** probe tokens with their estimates, posexplode'd by the query */
case class CMOut(toks: Seq[String], ests: Seq[Long])

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable typed
  * Aggregator: point-frequency estimation over a token stream in
  * O(depth × width) memory per partition, merged cell-wise across
  * executors — the sketch a 100 TB pipeline keeps when exact per-token
  * counts (O(vocabulary) shuffle state) are too big.
  *
  * Guarantee: est(t) ≥ true(t), and est(t) ≤ true(t) + ε·N with
  * probability ≥ 1−δ, where ε = e/width, δ = e^(−depth), N = total
  * occurrences. depth=4, width=2048 → ε ≈ 1.3e-3, δ ≈ 1.8%.
  *
  * Determinism: cell assignment is seeded MurmurHash3 of the token —
  * independent of partition layout — and cell-wise sums commute, so the
  * final sketch is identical under any aggregation order.
  */
class CountMin(probes: Seq[String], depth: Int = 4, width: Int = 2048)
    extends Aggregator[String, CMBuf, CMOut] with Serializable {

  private def cell(row: Int, tok: String): Int =
    row * width + Math.floorMod(MurmurHash3.stringHash(tok, 0x9747b28c + row), width)

  override def zero: CMBuf = CMBuf(new Array[Long](depth * width))

  override def reduce(b: CMBuf, tok: String): CMBuf = {
    var r = 0
    while (r < depth) { b.cells(cell(r, tok)) += 1L; r += 1 }
    b
  }

  override def merge(a: CMBuf, b: CMBuf): CMBuf = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
    a
  }

  override def finish(b: CMBuf): CMOut = {
    val ests = probes.map { t =>
      var est = Long.MaxValue
      var r = 0
      while (r < depth) { est = math.min(est, b.cells(cell(r, t))); r += 1 }
      est
    }
    CMOut(probes.toVector, ests.toVector)
  }

  override def bufferEncoder: Encoder[CMBuf] = Encoders.product[CMBuf]
  override def outputEncoder: Encoder[CMOut] = Encoders.product[CMOut]
}
