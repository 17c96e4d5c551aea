package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom streaming state (`KeyValueGroupedDataset` +
  * map/flatMapGroupsWithState) — the Structured Streaming capability
  * the reference never reaches (its state is only per-batch, SURVEY.md
  * §2.8). Two canonical stateful operators:
  *
  *  - [[dedupStream]]: exactly-once emission per key across the whole
  *    stream — the streaming fix for the reference's at-least-once JDBC
  *    appends (it compensates with a batch-layer dedup instead).
  *  - [[runningCounts]]: per-key running totals maintained in state and
  *    re-emitted every update.
  *
  * State is per-key and partitioned by the grouping key — scales
  * horizontally; state growth is the operational concern, so
  * [[dedupStream]] takes a processing-time timeout to expire keys.
  */
object StatefulOps {

  /** Stream-static enrichment join: every micro-batch left-joins the
    * static dimension snapshot, broadcast so the streaming side never
    * shuffles (the dim ships once per executor, not once per batch
    * row). The static side is pinned at query start — Spark's standard
    * stream-static contract; restart the query to pick up a new dim
    * version. The streaming analogue of the batch star joins in
    * [[graft.ops.JoinOps]]. */
  def enrichWithStatic(stream: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): org.apache.spark.sql.DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** Emit each key's FIRST record only, across micro-batches. Seen-keys
    * state expires after `timeoutMs` of inactivity (bounds state size;
    * pass 0 for no timeout). */
  def dedupStream[K, V](grouped: Dataset[V], key: V => K,
      timeoutMs: Long = 0)(
      implicit kEnc: org.apache.spark.sql.Encoder[K],
      vEnc: org.apache.spark.sql.Encoder[V]): Dataset[V] = {
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    grouped
      .groupByKey(key)
      .flatMapGroupsWithState[Boolean, V](
        OutputMode.Append(), timeoutConf) {
        (_: K, rows: Iterator[V], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // refresh the inactivity timeout — without this, a key that
            // keeps arriving still expires and re-emits after timeoutMs
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator.empty // key already emitted
          } else {
            state.update(true)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            rows.take(1)
          }
      }(Encoders.scalaBoolean, vEnc)
  }

  /** The Spark-native watermarked streaming dedup —
    * `dropDuplicatesWithinWatermark` — the built-in alternative to
    * [[dedupStream]] when "once per key within the watermark horizon"
    * is acceptable: no custom state code, and the state store evicts a
    * key as soon as the watermark passes its event time (bounded state
    * without a processing-time timeout). */
  def dedupWithinWatermark(df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String], tsCol: String,
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Per-key running count across the stream; emits the new total for
    * every key present in the batch (update-mode shape). */
  def runningCounts[K, V](ds: Dataset[V], key: V => K)(
      implicit kEnc: org.apache.spark.sql.Encoder[K],
      outEnc: org.apache.spark.sql.Encoder[(K, Long)]): Dataset[(K, Long)] =
    ds.groupByKey(key)
      .mapGroupsWithState[Long, (K, Long)](
        GroupStateTimeout.NoTimeout()) {
        (k: K, rows: Iterator[V], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (k, total)
      }(Encoders.scalaLong, outEnc)

  /** Per-key running (count, sum) via the Spark 4 arbitrary-state API
    * (`transformWithState` + typed [[ValueState]]) — the modern
    * replacement for `mapGroupsWithState`: named state variables with
    * per-state TTL, composable List/Map state, timers, and the
    * RocksDB-backed store it requires (changelog-checkpointed,
    * horizontally partitioned by key like all graft state). */
  class RunningTotalsProcessor[K](ttl: TTLConfig = TTLConfig.NONE)(
      implicit stateEnc: Encoder[(Long, Double)])
      extends StatefulProcessor[K, (K, Double), (K, Long, Double)] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals", stateEnc, ttl)

    override def handleInputRows(key: K, rows: Iterator[(K, Double)],
        timerValues: TimerValues): Iterator[(K, Long, Double)] = {
      var (n, sum) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { case (_, v) => n += 1; sum += v }
      totals.update((n, sum))
      Iterator.single((key, n, sum))
    }
  }

  /** [[RunningTotalsProcessor]] wired over a keyed (K, value) stream.
    * Requires the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider`). */
  def runningTotals[K](ds: Dataset[(K, Double)])(
      implicit kEnc: Encoder[K],
      stateEnc: Encoder[(Long, Double)],
      outEnc: Encoder[(K, Long, Double)]): Dataset[(K, Long, Double)] =
    ds.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor[K](),
        TimeMode.None(), OutputMode.Update())
}
