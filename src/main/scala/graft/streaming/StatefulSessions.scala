package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

import java.sql.Timestamp

/** Custom keyed state over a stream — the
  * `KeyValueGroupedDataset.mapGroupsWithState` path of the build brief
  * (arbitrary per-key state Spark's built-in windows can't express:
  * running per-user engagement counters with last-activity tracking).
  */
object StatefulSessions {

  final case class UserEvent(user_id: Long, ts: Timestamp, value: Double)

  /** Running per-user state: event count, value sum, last-seen ts. */
  final case class UserState(n: Long, sum: Double, lastTs: Long)

  final case class UserSnapshot(user_id: Long, n: Long, sum: Double,
      last_ts: Timestamp)

  def updateState(userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserState]): UserSnapshot = {
    val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
    val next = events.foldLeft(prev) { (s, e) =>
      UserState(s.n + 1, s.sum + e.value, math.max(s.lastTs, e.ts.getTime))
    }
    state.update(next)
    UserSnapshot(userId, next.n, next.sum, new Timestamp(next.lastTs))
  }

  /** Streaming per-user running totals; Update output mode emits the
    * refreshed snapshot for every user touched by a micro-batch.
    */
  def runningTotals(spark: SparkSession, events: Dataset[UserEvent])
      : Dataset[UserSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
  }
}
