package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving frequent-items sketch (Metwally et al. 2005) as a typed
  * `Aggregator`: bounded-memory approximate top-k token counting.
  *
  * The buffer holds at most `Cap` (token, count) entries. A new token that
  * finds the buffer full evicts the minimum-count entry and inherits its
  * count + 1 — the classic guarantee: any token with true frequency
  * > N/Cap is present in the final sketch, and every reported count
  * overestimates the true count by at most N/Cap.
  *
  * Scale story: this is the 100 TB replacement for `text_tokens`' full
  * groupBy when only the heavy hitters matter — each partition reduces to
  * an O(Cap) partial that merges associatively (union counts, keep top
  * Cap), so the shuffle carries ~Cap entries per partition instead of the
  * whole token distribution. All eviction/trim tie-breaks are (count,
  * token)-ordered, so the sketch is deterministic for a fixed partition
  * layout; contents are exact whenever the vocabulary fits the buffer.
  */
case class SSBuf(toks: Seq[String], cnts: Seq[Long])

object TopKTokens extends Aggregator[String, SSBuf, SSBuf] {
  val Cap = 64
  val K = 10

  override def zero: SSBuf = SSBuf(Vector.empty, Vector.empty)

  override def reduce(b: SSBuf, tok: String): SSBuf = {
    val i = b.toks.indexOf(tok)
    if (i >= 0) b.copy(cnts = b.cnts.updated(i, b.cnts(i) + 1))
    else if (b.toks.size < Cap) SSBuf(b.toks :+ tok, b.cnts :+ 1L)
    else {
      var mi = 0
      var j = 1
      while (j < b.cnts.size) {
        if (b.cnts(j) < b.cnts(mi) ||
          (b.cnts(j) == b.cnts(mi) && b.toks(j) < b.toks(mi))) mi = j
        j += 1
      }
      SSBuf(b.toks.updated(mi, tok), b.cnts.updated(mi, b.cnts(mi) + 1))
    }
  }

  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for ((t, c) <- a.toks.zip(a.cnts)) m(t) = m.getOrElse(t, 0L) + c
    for ((t, c) <- b.toks.zip(b.cnts)) m(t) = m.getOrElse(t, 0L) + c
    val kept =
      if (m.size <= Cap) m.toSeq.sortBy { case (t, c) => (-c, t) }
      else m.toSeq.sortBy { case (t, c) => (-c, t) }.take(Cap)
    SSBuf(kept.map(_._1).toVector, kept.map(_._2).toVector)
  }

  override def finish(b: SSBuf): SSBuf = {
    val top = b.toks.zip(b.cnts).sortBy { case (t, c) => (-c, t) }.take(K)
    SSBuf(top.map(_._1).toVector, top.map(_._2).toVector)
  }

  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
}
