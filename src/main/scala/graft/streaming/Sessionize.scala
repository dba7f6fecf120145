package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.10):
  * gap-based sessionization of an event stream per user.
  *
  * Correct across micro-batches AND out-of-order arrival: events are not
  * folded into the session counts the moment they arrive — they sit in a
  * small per-key buffer until the event-time watermark passes them, and
  * only then are they finalized in timestamp order. An event from batch
  * 3 that lands between two batch-1 events therefore still sessionizes
  * in the right place, as long as it beats the watermark (later than
  * that, the engine's watermark filter has already dropped it — the
  * standard streaming contract).
  *
  * State per key = finalized (lastTs, sessions, events) + the pending
  * buffer, which is bounded by the lateness window × per-key event rate
  * — NOT by history. Emitted rows preview the totals as if the buffer
  * were folded now, tagged with a per-key emission sequence so the
  * read-out can take the LATEST preview (a later batch can lower
  * `n_sessions` when a late event bridges two previously-separate
  * sessions, so `max()` is not safe); `Trigger.AvailableNow` gives
  * batch parity for the oracle.
  */
object Sessionize {
  case class Event(user_id: Long, ts: Long, ets: java.sql.Timestamp)
  case class SessionState(pending: Seq[Long], lastTs: Long,
                          sessions: Long, events: Long, seq: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long,
                          seq: Long)

  private def fold(gapNanos: Long, lastTs0: Long, sessions0: Long,
                   events0: Long, ts: Seq[Long]): (Long, Long, Long) = {
    var (lastTs, sessions, events) = (lastTs0, sessions0, events0)
    ts.foreach { t =>
      val newSession = lastTs == Long.MinValue || t - lastTs > gapNanos
      if (newSession) sessions += 1
      events += 1
      lastTs = t
    }
    (lastTs, sessions, events)
  }

  def sessionStep(gapNanos: Long)(
      userId: Long, batch: Iterator[Event],
      state: GroupState[SessionState]): Iterator[UserSessions] = {
    // Watermark in event-time nanos; 0 during the first batch.
    val wmNanos = state.getCurrentWatermarkMs() * 1000000L
    val st = state.getOption.getOrElse(
      SessionState(Nil, Long.MinValue, 0L, 0L, 0L))
    val merged = (st.pending ++ batch.map(_.ts)).sorted
    // Finalize only events the watermark has passed — nothing older can
    // still arrive, so their fold order is now settled.
    val (ripe, pending) = merged.partition(_ <= wmNanos)
    val (lastTs, sessions, events) =
      fold(gapNanos, st.lastTs, st.sessions, st.events, ripe)
    val seq = st.seq + 1
    state.update(SessionState(pending, lastTs, sessions, events, seq))
    // Preview: totals as if the (still-revisable) buffer folded now.
    val (_, pSessions, pEvents) = fold(gapNanos, lastTs, sessions, events, pending)
    Iterator.single(UserSessions(userId, pSessions, pEvents, seq))
  }

  /** Run the sessionizer over one parquet table with AvailableNow;
    * returns (user_id, n_sessions, n_events). The source's `ts` is
    * either a real TIMESTAMP (the current parquet gate tables) or a
    * legacy nanos-epoch long; both normalize to the nanos long the
    * gap arithmetic in [[Event]] runs on (µs → nanos is exact ×1000,
    * within long range until the year 2262). */
  def userSessions(spark: SparkSession, dir: String, fileGlob: String,
                   gapNanos: Long, lateness: String = "1 hour",
                   maxFilesPerTrigger: Int = 0,
                   trigger: Trigger = Trigger.AvailableNow(),
                   finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    import spark.implicits._
    val schema = Ingest.sourceSchema(spark, dir, fileGlob)
    val qn = "graft_sessions"
    val tsNanos = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp")) * 1000L
    }
    val q = Ingest.fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .select(col("user_id"), tsNanos.as("ts"),
        Ingest.eventTime(schema).as("ets"))
      .withWatermark("ets", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(sessionStep(gapNanos))
      .toDF()
      .writeStream.queryName(qn).outputMode("update")
      .format("memory").trigger(trigger).start()
    finish(q)
    // Update mode emits a row per batch per key. Last-wins by the per-key
    // emission sequence: a late bridging event can REDUCE the previewed
    // session count in a later batch, so max(n_sessions) could serve a
    // stale larger preview — max_by(…, seq) always serves the newest.
    spark.table(qn).groupBy("user_id")
      .agg(max_by(col("n_sessions"), col("seq")).as("n_sessions"),
        max_by(col("n_events"), col("seq")).as("n_events"))
  }
}
