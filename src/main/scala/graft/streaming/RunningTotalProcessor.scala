package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4 `transformWithState` processor keeping per-key running
  * (count, sum) state — the library's reusable arbitrary-state building
  * block (the stateful twin of `stream_stateful`'s batch prefix-window
  * form; StreamingSpec drives it over multiple triggers and asserts it
  * converges to exactly that frame).
  *
  * Scale notes: state is O(keys) × 16 bytes in the state store, updated
  * once per (key, microbatch) — not per row; the per-batch fold happens
  * on the executor holding the key's partition, so the shuffle carries
  * input rows only. TTLConfig.NONE keeps totals forever — a production
  * deployment with key churn would set a TTL to bound the store.
  * Top-level class: it is serialized into the streaming query. */
/** Spark 4 `transformWithState` processor behind the streaming twin of
  * `stream_ingest_dedup`: keyed by content fingerprint, state = the
  * first doc_id that claimed it. A micro-batch's rows for a key are
  * folded in doc_id order (the deterministic arrival proxy the batch
  * form uses); the first claimer of an unseen fingerprint is admitted,
  * every later row — same batch, later trigger, or after a
  * checkpointed restart — is rejected with the keeper's id. Emits one
  * (doc_id, admitted, first_id) verdict per input row.
  *
  * Scale notes: state is O(distinct fingerprints) × 8 bytes — the
  * streaming analogue of dedup_exact's hash groupBy, and exactly the
  * fingerprint set sink_bloom materializes; a production ingest fronts
  * this with that bloom filter so the state store only sees probable
  * hits. The shuffle carries (fingerprint, doc_id) pairs, never text.
  * Top-level class: serialized into the streaming query. */
class IngestDedupProcessor
    extends StatefulProcessor[String, (Long, String), (Long, Long, Long)] {
  @transient private var first: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    first = getHandle.getValueState[Long]("first_id",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val ids = rows.map(_._1).toArray.sorted
    val prior = if (first.exists()) Some(first.get()) else None
    val keeper = prior.getOrElse(ids.head)
    if (prior.isEmpty) first.update(keeper)
    // admit by POSITION, not value: an at-least-once source can replay
    // the keeper row within one micro-batch (ids = [5, 5]) and a
    // value-based test would emit TWO admission verdicts for one
    // fingerprint — exactly-once admission means index 0 only
    ids.iterator.zipWithIndex.map { case (id, ix) =>
      (id, if (prior.isEmpty && ix == 0) 1L else 0L, keeper) }
  }
}

/** Spark 4 `transformWithState` processor behind the streaming twin of
  * `stream_ingest_neardup`: keyed by MinHash BAND key, state = the
  * first doc_id that arrived in this band bucket (admitted or not —
  * the observed-set semantics the batch form documents). A
  * micro-batch's rows for a bucket fold in doc_id order (the
  * deterministic arrival proxy); every distinct doc in the batch gets
  * one (doc_id, bucket_first_id) verdict, and the per-document
  * admit/reject combine — admitted iff first_id = doc_id in ALL 4 of
  * its buckets — runs as a doc_id groupBy on the processor's output
  * WITHIN each micro-batch (every band row of a doc rides the same
  * input row, so the combine never needs cross-batch state; the
  * groupBy also collapses at-least-once replays of the same doc).
  *
  * Scale notes: state is O(observed docs × bands) × 8 bytes keyed by
  * band — the shuffle carries (band-key, doc_id), never text; each
  * bucket's state is updated at most once per micro-batch. Top-level
  * class: serialized into the streaming query. */
class NearDupBandProcessor
    extends StatefulProcessor[String, (Long, String), (Long, Long)] {
  @transient private var first: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    first = getHandle.getValueState[Long]("first_id",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val ids = rows.map(_._1).toArray.sorted.distinct
    val keeper = if (first.exists()) first.get() else ids.head
    if (!first.exists()) first.update(keeper)
    ids.iterator.map(id => (id, keeper))
  }
}

class RunningTotalProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)]("running",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val (n0, v0) = if (state.exists()) state.get() else (0L, 0.0)
    val batch = rows.toSeq
    val next = (n0 + batch.size, v0 + batch.map(_._2).sum)
    state.update(next)
    Iterator.single((key, next._1, next._2))
  }
}
