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
