package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Stateful anchor-to-last-KEPT debounce on Spark 4's
  * `transformWithState` — the SEQUENTIAL suppression rule the windowable
  * lag form (q_debounce) deliberately approximates: an event is kept iff
  * it lands more than `gapUs` after the last event that was KEPT, so a
  * burst of events 1 s apart collapses to one kept event per gap window
  * (the lag form would drop the whole tail of the burst relative to its
  * immediate predecessor — different rule, both documented). This
  * recurrence is genuine per-key sequential state — exactly what the new
  * arbitrary-state API exists for, and the first-class replacement for
  * the flatMapGroupsWithState generation ([[Funnelize]]):
  * typed ValueState through an explicit handle, event-time mode, and the
  * RocksDB state store REQUIRED by the operator (state lives off-heap
  * and spills — the 24/7 posture; the caller conf-scopes the provider,
  * [[Debounce.debouncedCounts]] asserts it).
  *
  * Out-of-order contract is [[Sessionize]]/[[Funnelize]]'s: events
  * buffer per key until the watermark passes them and only then fold
  * into (lastKept, counters) in timestamp order; every batch emits a
  * seq-tagged PREVIEW with the pending suffix folded on top, so the
  * read-out (last-wins by seq) equals the batch replay without needing
  * a final watermark-advancing batch. State per key = counters + the
  * watermark-bounded pending buffer. One delta vs the
  * flatMapGroupsWithState generation: in EventTime mode the ENGINE
  * filters rows at-or-before the current watermark before they reach
  * [[DebounceProcessor.handleInputRows]] (the standard late-record
  * drop; fMGWS left that to the operator) — so an event time exactly
  * AT the initial zero watermark (epoch 0, i.e. only degenerate
  * fixtures) is dropped, and genuinely late events are dropped rather
  * than mis-folded.
  */
object Debounce {
  case class DEvent(user_id: Long, event_type: String, ts: Long,
                    ets: java.sql.Timestamp)
  case class DKey(user_id: Long, event_type: String)
  case class DState(pending: Seq[Long], lastKept: Long,
                    nKept: Long, nDropped: Long, seq: Long)
  case class DOut(user_id: Long, event_type: String,
                  n_kept: Long, n_dropped: Long, seq: Long)

  /** Sentinel for "nothing kept yet" (never a legal epoch-micros). */
  val Never: Long = Long.MinValue

  /** The debounce recurrence over ts-sorted events. */
  private def fold(gapUs: Long, lastKept0: Long, k0: Long, d0: Long,
                   evs: Seq[Long]): (Long, Long, Long) = {
    var last = lastKept0; var k = k0; var d = d0
    evs.foreach { ts =>
      if (last == Never || ts - last > gapUs) { last = ts; k += 1 }
      else d += 1
    }
    (last, k, d)
  }

  class DebounceProcessor(gapUs: Long)
      extends StatefulProcessor[DKey, DEvent, DOut] {
    @transient private var st: ValueState[DState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DState]("debounce",
        Encoders.product[DState], TTLConfig.NONE)

    override def handleInputRows(key: DKey, rows: Iterator[DEvent],
                                 timers: TimerValues): Iterator[DOut] = {
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val s0 = if (st.exists()) st.get()
        else DState(Nil, Never, 0L, 0L, 0L)
      val merged = (s0.pending ++ rows.map(_.ts)).sorted
      val (ripe, pending) = merged.partition(_ <= wmUs)
      val (last, k, d) = fold(gapUs, s0.lastKept, s0.nKept, s0.nDropped, ripe)
      val seq = s0.seq + 1
      st.update(DState(pending, last, k, d, seq))
      val (_, pk, pd) = fold(gapUs, last, k, d, pending)
      Iterator.single(DOut(key.user_id, key.event_type, pk, pd, seq))
    }
  }

  /** Kept/dropped counts per (user, type) under last-KEPT debounce over
    * one parquet table. Requires the RocksDB state store provider (the
    * engine rejects transformWithState on the default heap provider) —
    * the conf is set for the session and restored after the run. */
  def debouncedCounts(spark: SparkSession, dir: String, fileGlob: String,
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
      val qn = "graft_stream_debounce"
      val q = Ingest.fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
        .select(col("user_id"), col("event_type"), tsUs.as("ts"),
          Ingest.eventTime(schema).as("ets"))
        .withWatermark("ets", lateness)
        .as[DEvent]
        .groupByKey(e => DKey(e.user_id, e.event_type))
        .transformWithState(new DebounceProcessor(gapUs),
          TimeMode.EventTime(), OutputMode.Update())
        .toDF()
        .writeStream.queryName(qn).outputMode("update")
        .format("memory").trigger(trigger).start()
      finish(q)
      spark.table(qn)
        .groupBy("user_id", "event_type")
        .agg(max_by(struct(col("n_kept"), col("n_dropped")), col("seq"))
          .as("c"))
        .select(col("user_id"), col("event_type"),
          col("c.n_kept").as("n_kept"), col("c.n_dropped").as("n_dropped"))
    } finally saved match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
