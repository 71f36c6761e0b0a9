package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful streaming (engine extension, SURVEY §2.9 note):
  * `flatMapGroupsWithState` wrappers for custom per-key state beyond
  * what windowed aggregation expresses. State lives in the streaming
  * state store (checkpointed, partitioned by key) — per-key size is
  * O(1) here, so the operator scales with distinct keys, not events. */
object Stateful {

  private implicit val longEncoder: Encoder[Long] = Encoders.scalaLong

  /** Running event count per key, emitted on every update. */
  def runningCount[K: Encoder](grouped: KeyValueGroupedDataset[K, _])(
      implicit e: Encoder[(K, Long)]): Dataset[(K, Long)] =
    grouped.flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (key: K, values: Iterator[_], state: GroupState[Long]) =>
        val n = state.getOption.getOrElse(0L) + values.size
        state.update(n)
        Iterator((key, n))
    }

  /** Running max of a per-event Long measure, emitted on change only —
    * the "new high-water mark" pattern. */
  def highWaterMark[K: Encoder](grouped: KeyValueGroupedDataset[K, Long])(
      implicit e: Encoder[(K, Long)]): Dataset[(K, Long)] =
    grouped.flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (key: K, values: Iterator[Long], state: GroupState[Long]) =>
        val incoming = values.foldLeft(Long.MinValue)(math.max)
        val prev = state.getOption.getOrElse(Long.MinValue)
        if (incoming > prev) {
          state.update(incoming)
          Iterator((key, incoming))
        } else Iterator.empty
    }
}
