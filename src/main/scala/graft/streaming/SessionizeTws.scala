package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** PER-SESSION emission with event-time TIMERS on `transformWithState`
  * — the capability the flatMapGroupsWithState generation
  * ([[Sessionize]]) structurally lacks: there, a key is only touched
  * when a batch carries input for it, so a user who goes quiet can
  * never have their last session CLOSED and emitted (Sessionize works
  * around it by emitting revisable per-user PREVIEWS). Here each key
  * registers an event-time timer at (last event + gap); when the
  * watermark passes it the engine calls [[SessionProcessor
  * .handleExpiredTimer]] for that key — with NO input rows anywhere
  * near it — and the closed session emits exactly once, final. That is
  * the append-semantics session stream a downstream consumer actually
  * wants (one row per finished session), not a changelog of previews.
  *
  * Out-of-order contract as everywhere in this package: arrivals
  * buffer per key; both entry points fold only watermark-ripe events,
  * in timestamp order, into the open session; a session closes only
  * once the watermark passes its end + gap (nothing can extend it
  * anymore). Late-beyond-watermark rows are dropped by the engine's
  * EventTime filter (the standard contract). State per key = the open
  * session triple + the lateness-bounded pending buffer; RocksDB
  * provider required by the engine (conf-scoped by the runner).
  */
object SessionizeTws {
  case class SEvent(user_id: Long, ts: Long, ets: java.sql.Timestamp)
  case class SessState(pending: Seq[Long], openStart: Long, openEnd: Long,
                       openN: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)

  /** Sentinel for "no open session". */
  val NoOpen: Long = Long.MinValue

  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SEvent, ClosedSession] {
    @transient private var st: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("session",
        Encoders.product[SessState], TTLConfig.NONE)

    /** Fold ripe pending into the open session, close what the
      * watermark has sealed, emit closures, re-arm the timer. Shared by
      * both entry points; idempotent under duplicate timer firings. */
    private def advance(key: Long, newTs: Seq[Long],
                        wmUs: Long): Iterator[ClosedSession] = {
      val s0 = if (st.exists()) st.get() else SessState(Nil, NoOpen, 0L, 0L)
      val merged = (s0.pending ++ newTs).sorted
      val (ripe, rest) = merged.partition(_ <= wmUs)
      var (start, end, n) = (s0.openStart, s0.openEnd, s0.openN)
      val out = Seq.newBuilder[ClosedSession]
      ripe.foreach { t =>
        if (start == NoOpen) { start = t; end = t; n = 1 }
        else if (t - end > gapUs) {
          out += ClosedSession(key, start, end, n)
          start = t; end = t; n = 1
        } else { end = t; n += 1 }
      }
      // the open session is sealed once nothing can extend it: every
      // still-pending event is > wm ≥ end + gap, so it would start a
      // NEW session anyway
      if (start != NoOpen && wmUs > end + gapUs) {
        out += ClosedSession(key, start, end, n)
        start = NoOpen; end = 0L; n = 0L
      }
      st.update(SessState(rest, start, end, n))
      // re-arm: the earliest future instant at which something becomes
      // ripe or closable — the open session's seal point, or the first
      // buffered event (its fold unlocks when the watermark passes it)
      val nextUs =
        if (start != NoOpen) Some(end + gapUs)
        else rest.headOption
      nextUs.foreach(us => getHandle.registerTimer(us / 1000L + 1L))
      out.result().iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[SEvent],
                                 timers: TimerValues): Iterator[ClosedSession] =
      advance(key, rows.map(_.ts).toSeq,
        timers.getCurrentWatermarkInMs() * 1000L)

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ClosedSession] =
      advance(key, Nil, timers.getCurrentWatermarkInMs() * 1000L)
  }

  /** Closed sessions per user over one parquet table: one row per
    * finished session — `(user_id, sid, start_us, end_us, n_events)`,
    * sid 1-based per user in start order (a presentation window over
    * the small closed-session stream, not over events). Trailing
    * sessions only close once the watermark passes their end + gap —
    * a drain-and-stop run that needs every session closed appends a
    * flush sentinel under a filterable key, exactly like
    * [[Ingest.intervalJoinLeftOuterStream]]'s gate fixture. */
  def closedSessions(spark: SparkSession, dir: String, fileGlob: String,
                     gapUs: Long, lateness: String = "1 hour",
                     maxFilesPerTrigger: Int = 0,
                     trigger: Trigger = Trigger.AvailableNow(),
                     finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    import spark.implicits._
    require(gapUs >= 0, s"need gapUs >= 0; got $gapUs")
    val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
    val RocksDb =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val saved = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val schema = Ingest.sourceSchema(spark, dir, fileGlob)
      val tsUs = schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
        case _ => unix_micros(col("ts").cast("timestamp"))
      }
      val qn = "graft_tws_sessions"
      val q = Ingest.fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
        .select(col("user_id"), tsUs.as("ts"),
          Ingest.eventTime(schema).as("ets"))
        .withWatermark("ets", lateness)
        .as[SEvent]
        .groupByKey(_.user_id)
        .transformWithState(new SessionProcessor(gapUs),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF()
        .writeStream.queryName(qn).outputMode("append")
        .format("memory").trigger(trigger).start()
      finish(q)
      spark.table(qn)
        .withColumn("sid", row_number().over(
          Window.partitionBy("user_id").orderBy("start_us")))
        .select("user_id", "sid", "start_us", "end_us", "n_events")
    } finally saved match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
