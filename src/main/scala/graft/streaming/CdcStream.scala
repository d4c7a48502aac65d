package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CDC compaction — the Structured Streaming twin of the batch
  * q68 latest-per-key operator (`SnapshotDiff.latestByKey`): an upsert
  * log arrives continuously and the pipeline maintains the CURRENT state
  * per key, emitting a key's refreshed row whenever a newer version
  * lands.
  *
  * `mapGroupsWithState` keeps exactly ONE row of state per key — the
  * running maximum under the (ts, event_id) total order plus a version
  * counter — so state is O(distinct keys), independent of log length,
  * and the per-trigger shuffle is keyed on `user_id` exactly like the
  * batch aggregate's exchange. Late or replayed versions are handled by
  * the same total order: a version older than the held state updates
  * nothing but still counts toward `n_versions` (at-least-once replays
  * that REDELIVER the same event would need an id-dedup stage, q-stream
  * dedup, in front).
  *
  * State never expires (`NoTimeout`): "current state" semantically has
  * no horizon, and the operator pins that choice rather than exposing a
  * timeout knob — honouring a timeout means MORE than passing the enum
  * (the update function must arm `state.setTimeoutTimestamp` per key and
  * handle `state.hasTimedOut` by REMOVING state instead of re-emitting
  * it), so a churning-keyspace variant is a deliberate second operator,
  * not a parameter default away.
  *
  * The SAME code path executes on a batch Dataset (Spark runs
  * `mapGroupsWithState` over batch groups with empty initial state), so
  * the batch==stream equivalence is structural, and the ScalaTest proves
  * both equal the q68 aggregate formulation.
  */
object CdcStream {

  final case class Version(
      user_id: Long, ts: Long, event_id: Long, event_type: String, value: Double)
  final case class Current(
      user_id: Long, last_ts: Long, last_event_id: Long,
      last_event_type: String, last_value: Double, n_versions: Long)

  private def newer(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
    aTs > bTs || (aTs == bTs && aId > bId)

  /** Fold a group's new versions into the held current row. Emitted once
    * per key per trigger (update semantics downstream). */
  private def update(key: Long, versions: Iterator[Version],
      state: GroupState[Current]): Current = {
    var cur = state.getOption.orNull
    versions.foreach { v =>
      cur =
        if (cur == null)
          Current(key, v.ts, v.event_id, v.event_type, v.value, 1L)
        else if (newer(v.ts, v.event_id, cur.last_ts, cur.last_event_id))
          Current(key, v.ts, v.event_id, v.event_type, v.value, cur.n_versions + 1L)
        else cur.copy(n_versions = cur.n_versions + 1L)
    }
    state.update(cur)
    cur
  }

  /** Current state per key over a (batch or streaming) version log. */
  def latestPerKey(log: Dataset[Version]): Dataset[Current] = {
    import log.sparkSession.implicits._
    log.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
