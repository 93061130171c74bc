package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.schema.TranscriptTurn

/** Cumulative per-conversation session state. `lastIdx` disambiguates
  * "last role" because iterator order within a group is NOT guaranteed —
  * every fold below is order-independent. Timestamps are carried as
  * java.sql.Timestamp (not epoch-ms) so microsecond precision survives the
  * state round-trip.
  */
final case class SessState(
    nTurns: Long,
    firstTs: Option[java.sql.Timestamp], lastTs: Option[java.sql.Timestamp],
    lastIdx: Int, lastRole: String)

/** One emitted session row. `closed=false` rows are the running snapshot
  * after a micro-batch touched the conversation; `closed=true` fires once
  * when the event-time watermark passes last_ts + gap (streaming only —
  * batch runs see every row at once and never time out).
  */
final case class ConvSession(
    conv_id: String, n_turns: Long,
    first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp,
    last_role: String, closed: Boolean)

/** Custom streaming state via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset face of the engine (SURVEY §1: Structured
  * Streaming for streams; custom state where windows can't express it).
  *
  * Sessionization by inactivity gap: per conv_id, fold turns into a
  * cumulative SessState; emit a running snapshot per micro-batch and a
  * final `closed` row when event time moves `gap` past the last turn.
  *
  * Scale shape: state is per-key constant size (5 fields — no buffered
  * rows), keys partition across executors by groupByKey's hash shuffle,
  * and the store is incremental per micro-batch (RocksDB-backed in
  * production). The same function body runs in BATCH mode (one invocation
  * per key, no timeouts) — which is how the driver gate value-checks it
  * against a SQL oracle.
  */
object SessionTracker {

  def fold(state: Option[SessState], rows: Iterator[TranscriptTurn]): SessState = {
    var s = state.getOrElse(SessState(0L, None, None, Int.MinValue, null))
    rows.foreach { t =>
      s = SessState(
        nTurns = s.nTurns + 1,
        firstTs = Some(s.firstTs.filter(_.compareTo(t.ts) <= 0).getOrElse(t.ts)),
        lastTs = Some(s.lastTs.filter(_.compareTo(t.ts) >= 0).getOrElse(t.ts)),
        lastIdx = math.max(s.lastIdx, t.turn_idx),
        lastRole = if (t.turn_idx >= s.lastIdx) t.role else s.lastRole)
    }
    s
  }

  private def toRow(key: String, s: SessState, closed: Boolean): ConvSession =
    ConvSession(key, s.nTurns, s.firstTs.orNull, s.lastTs.orNull, s.lastRole, closed)

  def update(gapMs: Long)(
      key: String, rows: Iterator[TranscriptTurn],
      state: GroupState[SessState]): Iterator[ConvSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(toRow(key, s, closed = true))
    } else {
      val s = fold(state.getOption, rows)
      state.update(s)
      // event-time timeout: fires once the watermark passes last turn + gap.
      // gapMs=0 disables it — REQUIRED in batch mode, where every group is
      // seen exactly once and no watermark exists to time out against.
      // Clamped to just past the CURRENT watermark: out-of-order arrivals
      // (a turn older than the watermark, legal within the watermark
      // delay or via multi-batch replays) would otherwise compute a
      // timeout in the past, which Spark rejects — such a session is
      // already expired and closes at the next watermark advance
      if (gapMs > 0) state.setTimeoutTimestamp(
        math.max(s.lastTs.get.getTime + gapMs, state.getCurrentWatermarkMs() + 1))
      Iterator(toRow(key, s, closed = false))
    }
  }

  /** Works on both a streaming Dataset (call `.withWatermark("ts", ...)`
    * upstream so event-time timeouts can fire) and a batch Dataset (one
    * snapshot row per conversation).
    */
  def sessionize(turns: Dataset[TranscriptTurn], gapMs: Long): Dataset[ConvSession] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMs))
  }
}
