package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

/** Streaming ordered-step funnel — the `flatMapGroupsWithState` twin of
  * [[graft.operators.Behavior.windowFunnel]]: per-user first-completion
  * times of k strictly-ordered steps, maintained INCREMENTALLY over an
  * event stream (conversion tracking that doesn't re-scan history every
  * time someone asks).
  *
  * Same out-of-order contract as [[Sessionize]]: events buffer per key
  * until the event-time watermark passes them, and only then fold into
  * the slot state in timestamp order — so a click from micro-batch 3
  * that lands between two batch-1 events still funnels in the right
  * place. State per key = k slot times + the watermark-bounded pending
  * buffer; emitted rows preview the slots as if the buffer folded now,
  * tagged with an emission sequence for last-wins read-out (a late
  * EARLIER step event can change which click "follows" the view, so a
  * later preview may legitimately differ — max() over previews would
  * serve stale state).
  */
object Funnelize {
  case class FEvent(user_id: Long, ts: Long, idx: Int, ets: java.sql.Timestamp)
  case class FunnelState(pending: Seq[(Long, Int)], slots: Seq[Long], seq: Long)
  case class UserFunnel(user_id: Long, slots: Seq[Long], seq: Long)

  /** Sentinel for an unreached slot (never a legal epoch-micros). */
  val Unset: Long = Long.MinValue

  /** The shared transition (see Behavior.windowFunnel's contract): slot
    * j fills with the FIRST event of its step that strictly follows
    * slot j−1 within the horizon anchored at slot 0. `evs` must be
    * sorted by (ts, idx) — same earlier-step-first tie rule as the
    * batch fold's sort_array. */
  private def fold(horizonUs: Long, slots0: Seq[Long],
                   evs: Seq[(Long, Int)]): Seq[Long] = {
    val slots = slots0.toArray
    evs.foreach { case (ts, i) =>
      val prevOk = i == 0 || (slots(i - 1) != Unset && ts > slots(i - 1))
      val horizonOk = i == 0 || ts <= slots(0) + horizonUs
      if (slots(i) == Unset && prevOk && horizonOk) slots(i) = ts
    }
    slots.toSeq
  }

  /** One micro-batch of one user's step events. Finalizes only events
    * the watermark has passed; previews the rest. */
  def funnelStep(k: Int, horizonUs: Long)(
      userId: Long, batch: Iterator[FEvent],
      state: GroupState[FunnelState]): Iterator[UserFunnel] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val st = state.getOption.getOrElse(
      FunnelState(Nil, Seq.fill(k)(Unset), 0L))
    val merged = (st.pending ++ batch.map(e => (e.ts, e.idx))).sorted
    val (ripe, pending) = merged.partition(_._1 <= wmUs)
    val slots = fold(horizonUs, st.slots, ripe)
    val seq = st.seq + 1
    state.update(FunnelState(pending, slots, seq))
    Iterator.single(UserFunnel(userId, fold(horizonUs, slots, pending), seq))
  }

  /** Run the streaming funnel over one parquet table with AvailableNow
    * (or a caller-supplied trigger): returns one row per user that
    * reached step 0 — (user_id, t0..tk-1 epoch-micros nullable,
    * reached), the same shape as the batch operator, so the two are
    * directly comparable. `ts` may be a real timestamp (µs) or a
    * legacy nanos-long; both normalize to micros. */
  def userFunnels(spark: SparkSession, dir: String, fileGlob: String,
                  steps: Seq[String], horizonUs: Long,
                  lateness: String = "1 hour",
                  maxFilesPerTrigger: Int = 0,
                  trigger: Trigger = Trigger.AvailableNow(),
                  finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct; got $steps")
    val k = steps.size
    val schema = Ingest.sourceSchema(spark, dir, fileGlob)
    val tsUs = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val idxPairs = steps.zipWithIndex
    val stepIdx = idxPairs.tail.foldLeft(
      when(col("event_type") === idxPairs.head._1, idxPairs.head._2)) {
      case (acc, (s, i)) => acc.when(col("event_type") === s, i)
    }
    val qn = "graft_funnel"
    val q = Ingest.fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type").isin(steps.map(x => x: Any): _*))
      .select(col("user_id"), tsUs.as("ts"), stepIdx.as("idx"),
        Ingest.eventTime(schema).as("ets"))
      .withWatermark("ets", lateness)
      .as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(funnelStep(k, horizonUs))
      .toDF()
      .writeStream.queryName(qn).outputMode("update")
      .format("memory").trigger(trigger).start()
    finish(q)
    val last = spark.table(qn).groupBy("user_id")
      .agg(max_by(col("slots"), col("seq")).as("slots"))
    val ts = (0 until k).map { j =>
      val v = element_at(col("slots"), j + 1)
      when(v =!= Funnelize.Unset, v).as(s"t$j")
    }
    val reached = (1 to k).map(j =>
      when(element_at(col("slots"), j) =!= Funnelize.Unset, 1L).otherwise(0L))
      .reduce(_ + _)
    last.filter(element_at(col("slots"), 1) =!= Funnelize.Unset)
      .select(col("user_id") +: ts :+ reached.as("reached"): _*)
  }
}
