package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.10):
  * gap-based sessionization of an event stream per user.
  *
  * Each key's state is one (lastTs, sessionCount, eventCount) triple —
  * bounded per key, so 10⁹ users cost gigabytes of state, not a shuffle
  * of history. Events inside a micro-batch are sorted in-function
  * (bounded by batch size per key); cross-batch order is carried by the
  * state. `Trigger.AvailableNow` gives batch parity for the oracle.
  */
object Sessionize {
  case class Event(user_id: Long, ts: Long)
  case class SessionState(lastTs: Long, sessions: Long, events: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  def sessionStep(gapNanos: Long)(
      userId: Long, batch: Iterator[Event],
      state: GroupState[SessionState]): Iterator[UserSessions] = {
    val sorted = batch.toSeq.sortBy(_.ts)
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val newSession = st.lastTs == Long.MinValue || e.ts - st.lastTs > gapNanos
      st = SessionState(e.ts,
        st.sessions + (if (newSession) 1 else 0), st.events + 1)
    }
    state.update(st)
    Iterator.single(UserSessions(userId, st.sessions, st.events))
  }

  /** Run the sessionizer over one parquet table with AvailableNow;
    * returns (user_id, n_sessions, n_events). `ts` is a nanos-epoch
    * long column (the nanosAsLong read of the events table). */
  def userSessions(spark: SparkSession, dir: String, fileGlob: String,
                   gapNanos: Long): DataFrame = {
    import spark.implicits._
    val schema = spark.read.option("pathGlobFilter", fileGlob).parquet(dir).schema
    val qn = "graft_sessions"
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .parquet(dir)
      .select(col("user_id"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(sessionStep(gapNanos))
      .toDF()
      .writeStream.queryName(qn).outputMode("update")
      .format("memory").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Update mode can emit a row per batch per key; the last one wins.
    spark.table(qn).groupBy("user_id")
      .agg(max(col("n_sessions")).as("n_sessions"),
        max(col("n_events")).as("n_events"))
  }
}
