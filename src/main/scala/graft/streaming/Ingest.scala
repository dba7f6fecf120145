package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** File-arrival stream ingest (SURVEY §2.1 S1/S2, §2.10).
  *
  * The reference is an event-driven batch processor: a marker file lands,
  * one transaction processes the folder, commit is all-or-nothing
  * (register-fastq-dropbox plugin.properties:8-10). The Spark-native shape
  * is a Structured Streaming file source driven with
  * `Trigger.AvailableNow` — batch parity when idle, micro-batches when
  * running continuously — with aggregation state handled by the engine
  * and exactly-once via checkpoint + idempotent sink.
  */
object Ingest {
  /** File-source stream reader with the marker-glob filter and optional
    * per-file batching — the one shared definition behind every file
    * stream here and in [[Sessionize]] (the builder is REASSIGNED, not
    * mutated in place: DataStreamReader happens to return `this`, but
    * callers must not lean on that). */
  private[streaming] def fileStream(spark: SparkSession,
                                    schema: org.apache.spark.sql.types.StructType,
                                    fileGlob: String, dir: String,
                                    maxFilesPerTrigger: Int): DataFrame = {
    val reader0 = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
    val reader = if (maxFilesPerTrigger > 0)
      reader0.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader0
    reader.parquet(dir)
  }

  /** One schema inference per (session, source dir, glob) per JVM
    * (r18; guide §1.2 — VERDICT item 2's floor decomposition showed a
    * second directory listing + footer read per stream cell per rep,
    * outside the stream itself): metadata only, same caching contract
    * as [[graft.core.Tables.load]]. Stream source dirs only ever GROW
    * within a JVM (fixtures publish once, streams append files), and
    * appended files share the publisher's schema, so the first
    * inference stays correct for the session's lifetime. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), org.apache.spark.sql.types.StructType]()
  private[streaming] def sourceSchema(spark: SparkSession, dir: String,
      glob: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent((spark, dir, glob),
      _ => spark.read.option("pathGlobFilter", glob).parquet(dir).schema)

  /** Event-time expression for a frame's `ts` field, tolerant of both
    * physical encodings the events table has shipped with: a real
    * TIMESTAMP (µs precision — the current parquet gate tables) passes
    * through, a nanos-epoch long (legacy TIMESTAMP(NANOS) reads under
    * `nanosAsLong`, and the synthetic long-ts test sources) is
    * integer-divided to micros — never through double, 1e18 nanos
    * exceeds 2^53. */
  private[streaming] def eventTime(schema: org.apache.spark.sql.types.StructType): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts DIV 1000"))
      // NTZ (what plain parquet µs timestamps infer as) casts through the
      // session timezone — pinned to UTC by every entrypoint, so the cast
      // is the identity mapping the oracle's epoch_us assumes.
      case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
      case other => throw new IllegalArgumentException(
        s"events.ts must be a long (nanos) or timestamp column, got $other")
    }
  }

  /** Micro-batch ingest of one parquet table inside `dir`; grouped counts
    * via the streaming aggregation path (complete mode, memory sink).
    * `pathGlobFilter` plays the reference's marker-file role (S2): only
    * the matching upload is picked up. Terminates when all available
    * input is processed. */
  def groupedCounts(spark: SparkSession, dir: String, fileGlob: String,
                    keyCol: String): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_counts"
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .parquet(dir)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .writeStream.queryName(qn).outputMode("complete")
      .format("memory").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(qn)
  }

  /** Watermarked tumbling-window aggregation over the event stream —
    * the standard Structured Streaming shape for event-time analytics.
    * `ts` is normalized by [[eventTime]] (timestamp passes through, a
    * legacy nanos-epoch long is divided to micros). Update
    * mode emits a (window, key) row per batch it changed in, and counts
    * only grow, so the max() read-out is the final value whether the run
    * was one AvailableNow batch or many (`maxFilesPerTrigger` splits the
    * run into per-file micro-batches; 0 = all available at once).
    * Multi-batch caveat shared with every watermarked stream: an event
    * whose WINDOW END falls below the operator's watermark is dropped as
    * late (and the watermark reaches the operator filter one batch after
    * it advances — measured in MultiBatchIngestSpec, not assumed), so
    * batch-splitting equivalence holds for sources whose file order
    * keeps each window's stragglers within the 1 h bound; the spec
    * asserts both the equivalence and the drop. */
  def windowedCounts(spark: SparkSession, dir: String, fileGlob: String,
                     keyCol: String, maxFilesPerTrigger: Int = 0,
                     trigger: Trigger = Trigger.AvailableNow(),
                     finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_windows"
    val q = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .withColumn("ets", eventTime(schema))
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "1 hour").as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col(keyCol), col("n"))
      .writeStream.queryName(qn).outputMode("update")
      .format("memory").trigger(trigger).start()
    finish(q)
    // Update mode emits a row per (window, key) per batch it changed in;
    // counts only grow, so max = the final value (same defense as
    // Sessionize against multi-micro-batch runs).
    spark.table(qn).groupBy("wstart", keyCol)
      .agg(max(col("n")).as("n"))
  }

  /** Stream-static enrichment join (§2.10): every micro-batch of the
    * file-source stream joins a STATIC dimension — the standard shape
    * for enriching an event stream with reference data. The dim side is
    * broadcast: at 100 TB/day of events the stream must never shuffle
    * for a dimension lookup, and Spark re-plans the broadcast per
    * micro-batch, so a dim refresh between batches is picked up without
    * restarting the query. Aggregation runs on the enriched stream
    * (complete mode, memory sink — same read-out contract as
    * [[groupedCounts]]: complete mode rewrites the whole table each
    * micro-batch, so the final table equals the single-batch answer for
    * any `maxFilesPerTrigger` split; 0 = all available at once). */
  def enrichStream(spark: SparkSession, dir: String, fileGlob: String,
                   dim: DataFrame, streamKey: String, dimKey: String,
                   aggKey: String, valueCol: String,
                   maxFilesPerTrigger: Int = 0): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_enrich"
    val q = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .join(broadcast(dim), col(streamKey) === col(dimKey))
      .groupBy(col(aggKey))
      .agg(count(lit(1)).as("n"),
        graft.functions.ExactAgg.moneySum(col(valueCol), 100).as("sum_value"))
      .writeStream.queryName(qn).outputMode("complete")
      .format("memory").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(qn)
  }

  /** Streaming exact dedup: first sighting of each key tuple passes, later
    * duplicates are dropped, and `dropDuplicatesWithinWatermark` expires
    * key state once the watermark passes it — bounded state at any stream
    * length, vs the unbounded plain `dropDuplicates`. Only the key columns
    * are emitted: which non-key row a dedup keeps is arrival-order
    * dependent, so the deterministic contract (and the oracle's DISTINCT)
    * is the key set itself. Append mode: rows emit on first sight, no
    * watermark wait.
    *
    * DISTINCT-equivalence is CONDITIONAL on `watermark`: a duplicate
    * whose event time trails its first sighting by more than the
    * watermark arrives after the key's state has expired and re-emits.
    * The equivalence therefore holds (a) within a single AvailableNow
    * batch, as here and in the q_stream_dedup oracle, or (b) in a
    * multi-batch/continuous run only for keys whose duplicate spread in
    * event time stays within `watermark` — size it to the source's real
    * out-of-orderness, trading state for dedup reach. */
  def dedupStream(spark: SparkSession, dir: String, fileGlob: String,
                  keys: Seq[String], watermark: String = "1 hour",
                  maxFilesPerTrigger: Int = 0,
                  trigger: Trigger = Trigger.AvailableNow(),
                  finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_dedup"
    val q = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .withColumn("ets", eventTime(schema))
      .withWatermark("ets", watermark)
      .dropDuplicatesWithinWatermark(keys)
      .select(keys.map(col): _*)
      .writeStream.queryName(qn).outputMode("append")
      .format("memory").trigger(trigger).start()
    finish(q)
    spark.table(qn)
  }

  /** Stream-STREAM event-time interval join (§2.10) — the last of the
    * standard Structured Streaming join shapes ([[enrichStream]] covers
    * stream-static): two event streams from the same file source, inner
    * equi-join on `keyCol` with the right event constrained to the
    * interval [left − window, left]. Both sides are watermarked and the
    * interval bounds BOTH event times relative to each other, which is
    * what lets the engine expire join state: a left row older than
    * (watermark + window) can never match a future right row, so state
    * stays bounded at any stream length — the property that separates a
    * deployable stream-stream join from an unbounded buffer. Append
    * mode: a joined pair emits once, when both sides have arrived.
    * Under `AvailableNow` (the gate posture) a single batch sees all
    * input, so the emitted pair set equals the batch interval join the
    * oracle runs; in a multi-batch/continuous run the same caveat as
    * every watermarked operator applies — pairs whose halves arrive
    * farther apart in event time than the watermark are dropped late
    * (StreamJoinSpec measures both the equivalence and the drop). */
  def intervalJoinStream(spark: SparkSession, dir: String, fileGlob: String,
                         keyCol: String, leftType: String, rightType: String,
                         window: String = "1 hour",
                         watermark: String = "1 hour",
                         maxFilesPerTrigger: Int = 0,
                         trigger: Trigger = Trigger.AvailableNow(),
                         finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_join"
    val left = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col(keyCol).as("l_key"),
        eventTime(schema).as("l_ts"))
      .withWatermark("l_ts", watermark)
    val right = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === rightType)
      .select(col(keyCol).as("r_key"), eventTime(schema).as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    val q = left.join(right,
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window") &&
          col("r_ts") <= col("l_ts"))
      .writeStream.queryName(qn).outputMode("append")
      .format("memory").trigger(trigger).start()
    finish(q)
    spark.table(qn)
  }

  /** LEFT OUTER twin of [[intervalJoinStream]]: matched pairs emit as
    * they pair; an UNMATCHED left row emits with null right columns
    * only once the watermark passes the point where a match has become
    * impossible (l_ts + window + the watermark delay) — the engine
    * cannot know "no error followed this click" any earlier. That
    * timing is the one real delta from the batch left join: trailing
    * left rows whose no-match verdict the final watermark never
    * reaches stay un-emitted. A continuous deployment doesn't care
    * (the watermark keeps moving); a drain-and-stop run that needs
    * batch parity appends a FLUSH sentinel beyond every real event
    * time — one row per side, filtered out of the read-out — which is
    * exactly what the gate fixture does (and Spark runs the no-data
    * micro-batch that evicts and emits the expired state before
    * AvailableNow terminates). State stays bounded for exactly the
    * same interval-bounds-both-sides reason as the inner variant. */
  def intervalJoinLeftOuterStream(spark: SparkSession, dir: String,
                                  fileGlob: String, keyCol: String,
                                  leftType: String, rightType: String,
                                  window: String = "1 hour",
                                  watermark: String = "1 hour",
                                  maxFilesPerTrigger: Int = 0,
                                  trigger: Trigger = Trigger.AvailableNow(),
                                  finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_join_outer"
    val left = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col(keyCol).as("l_key"),
        eventTime(schema).as("l_ts"))
      .withWatermark("l_ts", watermark)
    val right = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === rightType)
      .select(col(keyCol).as("r_key"), eventTime(schema).as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    val q = left.join(right,
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window") &&
          col("r_ts") <= col("l_ts"),
        "leftOuter")
      .writeStream.queryName(qn).outputMode("append")
      .format("memory").trigger(trigger).start()
    finish(q)
    spark.table(qn)
  }

  /** STREAMING session windows — the built-in session_window
    * aggregation under the streaming runtime (merging per-key session
    * state across micro-batches, append mode emitting each session
    * exactly once when the watermark finalizes it). The batch twin
    * (q_swindow) pins the merge semantics; this pins the stateful
    * execution: same oracle, different runtime. A flush sentinel
    * (non-real key, beyond max event time) finalizes the trailing
    * sessions; the sentinel's own session can never finalize (its end
    * sits past the final watermark by construction) so it needs no
    * in-query filter — drop its key at the read-out. Emits (user_id,
    * session_start, session_end, n_events) in epoch micros. */
  def sessionWindowStream(spark: SparkSession, dir: String,
                          fileGlob: String, keyCol: String,
                          gap: String = "30 minutes",
                          watermark: String = "1 hour",
                          maxFilesPerTrigger: Int = 0,
                          trigger: Trigger = Trigger.AvailableNow(),
                          finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_swindow"
    val q = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .select(col(keyCol), eventTime(schema).as("t"))
      .withWatermark("t", watermark)
      .groupBy(col(keyCol),
        org.apache.spark.sql.functions.session_window(col("t"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"))
      .writeStream.queryName(qn).outputMode("append")
      .format("memory").trigger(trigger).start()
    finish(q)
    spark.table(qn)
  }

  /** LEFT SEMI member of the interval-join matrix: each left row
    * emits AT MOST ONCE, when its first in-window right arrives —
    * "did an error precede this click", without the pair
    * multiplication an inner join gives (a click with 5 in-window
    * errors emits 5 inner rows but 1 semi row). Matched-only
    * semantics need no flush sentinel: a left that never matches
    * simply never emits, which IS the answer. State expiry follows
    * the same interval-bounds-both-sides argument as the inner
    * variant. */
  def intervalJoinSemiStream(spark: SparkSession, dir: String,
                             fileGlob: String, keyCol: String,
                             leftType: String, rightType: String,
                             window: String = "1 hour",
                             watermark: String = "1 hour",
                             maxFilesPerTrigger: Int = 0,
                             trigger: Trigger = Trigger.AvailableNow(),
                             finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_join_semi"
    val left = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col(keyCol).as("l_key"),
        eventTime(schema).as("l_ts"))
      .withWatermark("l_ts", watermark)
    val right = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === rightType)
      .select(col(keyCol).as("r_key"), eventTime(schema).as("r_ts"))
      .withWatermark("r_ts", watermark)
    val q = left.join(right,
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window") &&
          col("r_ts") <= col("l_ts"),
        "leftSemi")
      .writeStream.queryName(qn).outputMode("append")
      .format("memory").trigger(trigger).start()
    finish(q)
    spark.table(qn)
  }

  /** FULL OUTER completion of the interval-join matrix
    * (inner / left-outer / full-outer): matched pairs emit as they
    * pair; an unmatched row on EITHER side emits with nulls opposite
    * once its watermark-expiry verdict is final. The left-outer
    * variant answers "which clicks saw no error"; full-outer
    * additionally surfaces "which errors belong to no click" — the
    * orphan signal — in the same pass instead of a second anti-join
    * job over the error stream. Same drain-to-batch-parity contract
    * as the left-outer twin: a flush sentinel per side, filtered from
    * the read-out, makes the AvailableNow result equal the batch FULL
    * JOIN. State bounds are unchanged — the interval bounds BOTH
    * sides, so each side's state expires by event time. */
  def intervalJoinFullOuterStream(spark: SparkSession, dir: String,
                                  fileGlob: String, keyCol: String,
                                  leftType: String, rightType: String,
                                  window: String = "1 hour",
                                  watermark: String = "1 hour",
                                  maxFilesPerTrigger: Int = 0,
                                  trigger: Trigger = Trigger.AvailableNow(),
                                  finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_join_full"
    val left = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col(keyCol).as("l_key"),
        eventTime(schema).as("l_ts"))
      .withWatermark("l_ts", watermark)
    val right = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === rightType)
      .select(col(keyCol).as("r_key"), eventTime(schema).as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    val q = left.join(right,
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window") &&
          col("r_ts") <= col("l_ts"),
        "fullOuter")
      .writeStream.queryName(qn).outputMode("append")
      .format("memory").trigger(trigger).start()
    finish(q)
    spark.table(qn)
  }

  /** CHAINED stateful operators in one streaming query — Spark 4's
    * multi-stateful-operator support ([[intervalJoinStream]]'s join
    * feeding a tumbling event-time window aggregation on the join's
    * own event-time column, `l_ts`). Before 3.5 this required two
    * queries with an intermediate sink (double I/O, double
    * checkpoints, extra latency hop); chained, the joined rows flow
    * straight into the window state inside the same micro-batch. The
    * watermark propagates THROUGH the join (delayed by the join's own
    * state horizon), so append mode still only emits finalized
    * windows.
    *
    * Deliberately NO filter hook between the two stateful operators:
    * a predicate placed there gets pushed through the equi-join onto
    * BOTH scan sides, BELOW the EventTimeWatermark nodes — rows meant
    * only to advance the watermark (flush sentinels) are then
    * filtered at the source and the watermark stalls (measured on the
    * q_stream_joinagg gate: watermark stuck at real-max−1 h, final
    * windows silently withheld). Drive drain semantics with sentinel
    * KEYS that cannot join instead of predicates that cannot be
    * placed safely. Emits (ws, we, n_pairs, cents): window bounds in
    * epoch micros, pair count, exact integral-cents sum of the right
    * value. */
  def intervalJoinWindowedStream(spark: SparkSession, dir: String,
                                 fileGlob: String, keyCol: String,
                                 leftType: String, rightType: String,
                                 window: String = "1 hour",
                                 watermark: String = "1 hour",
                                 aggWindow: String = "1 hour",
                                 maxFilesPerTrigger: Int = 0,
                                 trigger: Trigger = Trigger.AvailableNow(),
                                 finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val schema = sourceSchema(spark, dir, fileGlob)
    val qn = "graft_stream_join_windowed"
    val left = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col(keyCol).as("l_key"),
        eventTime(schema).as("l_ts"))
      .withWatermark("l_ts", watermark)
    val right = fileStream(spark, schema, fileGlob, dir, maxFilesPerTrigger)
      .filter(col("event_type") === rightType)
      .select(col(keyCol).as("r_key"), eventTime(schema).as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    val q = left.join(right,
        col("l_key") === col("r_key") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window") &&
          col("r_ts") <= col("l_ts"),
        "inner")
      .groupBy(org.apache.spark.sql.functions.window(col("l_ts"), aggWindow))
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("r_value") * 100).cast("long")).as("cents"))
      .select(unix_micros(col("window.start")).as("ws"),
        unix_micros(col("window.end")).as("we"),
        col("n_pairs"), col("cents"))
      .writeStream.queryName(qn).outputMode("append")
      .format("memory").trigger(trigger).start()
    finish(q)
    spark.table(qn)
  }

  /** Streaming producer for the snapshot layout: each micro-batch
    * commits as ONE new snapshot version (the first publishes, the
    * rest append by manifest carry-forward), so a continuously-fed
    * table gets time travel, CDC-by-manifest-diff
    * ([[graft.operators.Snapshot.changedBetween]]), stats skipping and
    * vacuum for free — the streaming half of the Iceberg/Delta story.
    * Per-batch cost is O(batch): the append references history, never
    * rewrites it.
    *
    * Exactly-once WITHOUT a staging dance: the batchId rides the
    * manifest as `#tag=batch=<id>`, and the manifest RENAME is the
    * commit point — so "was this batch committed" is atomic. A replay
    * (crash after commit, before the checkpoint advanced) finds its
    * batchId at or below the table's batch-tag watermark (a downward
    * scan, so maintenance commits between the crash and the restart
    * can't bury it) and skips; a crash BEFORE the
    * rename leaves nothing committed — the re-run stages fresh data
    * under its own claimed id and commits the SAME version number
    * (slots are assigned at commit, so nothing advanced). The crashed
    * attempt's staged files are orphans no version references;
    * [[graft.operators.Snapshot.vacuumOrphans]] reclaims them. The
    * checkpoint serializes batches, so only the LATEST batch can ever
    * replay — an older duplicate can't sneak behind a newer commit.
    *
    * CHECKPOINT-RESET SEMANTICS (name the footgun): the guard compares
    * batch IDS, and a stream restarted with a FRESH checkpoint against
    * an existing destination restarts them at 0 — every batch at or
    * below the table's watermark is treated as a replay and SKIPPED
    * (Delta's idempotent-writer `txnAppId` behavior). That is the
    * right answer for "same source, recovered checkpoint store"; it is
    * a silent data drop for "new source, recycled destination". A new
    * feed gets a new destDir (or an explicitly-removed batch-tag
    * history), never a recycled one.
    * Returns the final version read back. */
  def snapshotStream(spark: SparkSession, srcDir: String, fileGlob: String,
                     destDir: String, checkpointDir: String,
                     shape: DataFrame => DataFrame = identity,
                     statsCol: Option[String] = None,
                     maxFilesPerTrigger: Int = 1,
                     compactEvery: Int = 0,
                     compactMinRows: Long = 100000L,
                     compactTargetRows: Long = 1000000L,
                     trigger: Trigger = Trigger.AvailableNow(),
                     finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val S = graft.operators.Snapshot
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .option("maxFilesPerTrigger", math.max(maxFilesPerTrigger, 1))
      .parquet(srcDir)
      .writeStream.option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applySnapshotBatch(shape(batch.toDF()), destDir, batchId, statsCol,
          compactEvery, compactMinRows, compactTargetRows)
      }
      .trigger(trigger).start()
    finish(q)
    S.readSnapshot(spark, destDir, S.latestVersion(spark, destDir))
  }

  /** Streaming UPSERTS into a snapshot table — [[snapshotStream]]'s
    * merge-on-read twin: each micro-batch is shaped to upsert rows
    * (e.g. one latest row per key) and committed with
    * [[graft.operators.Snapshot.mergeSnapshotMoR]] at O(batch) cost —
    * the producer never reads a base file however large the table
    * grows, which is exactly what a high-frequency upsert stream
    * needs at 100 TB (snapshotStream's append is O(batch) too, but
    * appends can only ADD; this stream REPLACES by key). Exactly-once
    * rides the commit tag (`batch=<id>`): a replayed batch sees its
    * tag on the latest version and skips. `reconcileEvery` runs the
    * O(touched) reconcile every k batches (tagged with the same batch
    * id, so a crash between merge and reconcile replays into a
    * skip + re-reconcile — reconcile of a reconciled table is a
    * no-op), bounding the read-time resolve tax like snapshotStream's
    * compactEvery bounds small files. Returns the RESOLVED final
    * state. */
  def morStream(spark: SparkSession, srcDir: String, fileGlob: String,
                destDir: String, checkpointDir: String, keyCol: String,
                shape: DataFrame => DataFrame = identity,
                reconcileEvery: Int = 0,
                maxFilesPerTrigger: Int = 1,
                indexed: Boolean = false,
                foldEvery: Int = 0,
                trigger: Trigger = Trigger.AvailableNow(),
                finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val S = graft.operators.Snapshot
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .option("maxFilesPerTrigger", math.max(maxFilesPerTrigger, 1))
      .parquet(srcDir)
      .writeStream.option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyMorBatch(shape(batch.toDF()), destDir, batchId, keyCol,
          reconcileEvery, indexed, foldEvery)
      }
      .trigger(trigger).start()
    finish(q)
    S.readSnapshot(spark, destDir, S.latestVersion(spark, destDir))
  }

  /** [[snapshotStream]] with a materialized view maintained IN the
    * stream: each micro-batch appends to the source snapshot table and
    * then folds the delta into the count+sum view
    * ([[graft.operators.MaterializedView.refreshSumView]]) — the
    * aggregate stays queryable and version-pinned while the raw table
    * grows, at O(batch + touched view) per trigger. Both commits are
    * independently replay-safe (the append by its `batch=` tag, the
    * refresh by its `src_v` tag), so a crash between them repairs on
    * replay: the append skips, the refresh sees the un-folded source
    * version and folds it. Returns the view's final state. */
  def mvStream(spark: SparkSession, srcDir: String, fileGlob: String,
               destDir: String, mvDir: String, checkpointDir: String,
               keyCol: String, valCol: String,
               shape: DataFrame => DataFrame = identity,
               viewFiles: Int = 0,
               maxFilesPerTrigger: Int = 1,
               trigger: Trigger = Trigger.AvailableNow(),
               finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    val S = graft.operators.Snapshot
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .option("maxFilesPerTrigger", math.max(maxFilesPerTrigger, 1))
      .parquet(srcDir)
      .writeStream.option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applySnapshotBatch(shape(batch.toDF()), destDir, batchId)
        graft.operators.MaterializedView.refreshSumView(
          spark, destDir, mvDir, keyCol, valCol, viewFiles)
        ()
      }
      .trigger(trigger).start()
    finish(q)
    S.readSnapshot(spark, mvDir, S.latestVersion(spark, mvDir))
  }

  /** One micro-batch of [[morStream]]: bootstrap-publish on the first
    * batch, merge-on-read upsert after, maintenance every
    * `reconcileEvery` / `foldEvery` batches — all tagged
    * `batch=<batchId>` so a replay of an already-committed batch skips
    * without writing. `foldEvery` runs
    * [[graft.operators.Snapshot.compactSnapshotMoRLog]] — the O(log
    * bytes) fold that bounds the read-side resolve tax WITHOUT the
    * base rewrite `reconcileEvery` pays; on a hot 100 TB table the
    * stream folds often and reconciles rarely (or never). Both are
    * idempotent on an already-maintained table, so the crash-replay
    * argument is reconcile's. */
  private[graft] def applyMorBatch(out: DataFrame, destDir: String,
                                   batchId: Long, keyCol: String,
                                   reconcileEvery: Int = 0,
                                   indexed: Boolean = false,
                                   foldEvery: Int = 0): Unit = {
    val S = graft.operators.Snapshot
    val spark = out.sparkSession
    def maintain(): Unit = {
      if (foldEvery > 0 && (batchId + 1) % foldEvery == 0) {
        S.compactSnapshotMoRLog(spark, destDir,
          tag = Some(s"batch=$batchId"))
        ()
      }
      if (reconcileEvery > 0 && (batchId + 1) % reconcileEvery == 0) {
        S.reconcileSnapshotMoR(spark, destDir,
          tag = Some(s"batch=$batchId"))
        ()
      }
    }
    val latest = S.latestVersion(spark, destDir)
    val already = lastBatchTag(spark, destDir).exists(_ >= batchId)
    if (!already) {
      if (latest == 0) {
        // `indexed` births the table with a key bloom: every later MoR
        // commit carries the index (morStage words the batch files) and
        // the periodic reconcile preserves it — the streamed table
        // answers readSnapshotPoint at ANY point in its life
        if (indexed)
          S.publishSnapshotIndexed(out, destDir, Nil, keyCol,
            tag = Some(s"batch=$batchId"))
        else
          S.publishSnapshot(out, destDir, tag = Some(s"batch=$batchId"))
        ()
      } else
        S.mergeSnapshotMoR(out, destDir, keyCol,
          tag = Some(s"batch=$batchId"))
      maintain()
    } else
      // crash landed between this batch's merge and its maintenance:
      // the replay skips the merge (tag present) but must still
      // maintain — idempotent; a maintained table returns its version
      maintain()
  }

  /** One micro-batch of [[snapshotStream]]: commit `out` as the next
    * snapshot version tagged `batch=<batchId>`, or SKIP if the table's
    * batch-tag watermark ([[lastBatchTag]]) already covers this batch
    * (the replay case — crash after the manifest rename, before the
    * checkpoint advanced — including a replay across maintenance
    * commits that buried the tag). Factored out so the replay guard is
    * directly testable.
    *
    * Inline maintenance: with `compactEvery` = k > 0, every k-th batch
    * follows its append with [[graft.operators.Snapshot.compactSnapshot]]
    * — and the compaction version carries THE SAME `batch=<id>` tag, so
    * the replay guard holds whichever commit the crash interleaves: a
    * replay after either rename sees its own tag on the latest version
    * and skips. (A crash between the append and its compaction skips
    * that CYCLE's maintenance on replay — best-effort by design; the
    * next cycle packs the leftovers, and the table content is identical
    * either way.) */
  /** The table-level REPLAY WATERMARK — [[graft.operators.SnapshotTxn
    * .lastTagged]]'s idea at table granularity: the most recent
    * `batch=<j>` tag scanning versions DOWNWARD from the latest. The
    * head-only probe both appliers used until r15 had a burial hole:
    * same-driver maintenance committed between a crashed batch commit
    * and its replay (an operator compacting / Z-ordering / reconciling
    * a stopped stream's table before restart, without a batch tag)
    * hides the tag one version down and the replay re-applies the
    * batch. The scan costs O(untagged commits since the stream's last
    * batch) manifest reads — normally ZERO extra (the stream's own
    * commit is the head). A vacuumed gap before any batch tag is
    * answered by the table's PRUNED-BATCH WATERMARK
    * (`manifest/batchwm.txt`, written by [[graft.operators.Snapshot
    * .vacuum]] before it deletes any manifest — the txn log's
    * `#tagwm=` pattern at table granularity); a gap with NO watermark
    * (a pre-watermark vacuum, or hand pruning) is undecidable and
    * REFUSES loudly — mirroring [[graft.operators.SnapshotTxn
    * .lastTagged]] — instead of reading "never committed" and silently
    * double-applying the batch. */
  private[graft] def lastBatchTag(spark: SparkSession, destDir: String): Option[Long] = {
    val S = graft.operators.Snapshot
    val fs = new org.apache.hadoop.fs.Path(destDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    var k = S.latestVersion(spark, destDir)
    while (k >= 1) {
      if (!fs.exists(
          new org.apache.hadoop.fs.Path(s"$destDir/manifest/v$k.txt"))) {
        // pruned boundary with no tag above it: the watermark decides
        return S.batchWatermark(fs, destDir) match {
          case Some(-1L) => None // vacuum pruned nothing batch-tagged
          case Some(j)   => Some(j)
          case None => throw new IllegalStateException(
            s"replay guard for $destDir is undecidable: versions below " +
              s"v$k were pruned with no batch watermark recorded " +
              "(manifest/batchwm.txt — a pre-watermark vacuum or hand " +
              "pruning), so whether this stream's last batch already " +
              "committed cannot be answered and a silent re-commit " +
              "could double-apply it. Heal by committing one tagged " +
              "version through the stream (restart it with a FRESH " +
              "checkpoint only if the skipped-batch semantics below " +
              "are acceptable) or write the known floor to " +
              "manifest/batchwm.txt by hand")
        }
      }
      val t = S.versionTag(spark, destDir, k)
      if (t.exists(_.startsWith("batch=")))
        return t.map(S.parseBatchTag(_, s"version v$k of $destDir"))
      k -= 1
    }
    None
  }

  private[graft] def applySnapshotBatch(out: DataFrame, destDir: String,
                                        batchId: Long,
                                        statsCol: Option[String] = None,
                                        compactEvery: Int = 0,
                                        compactMinRows: Long = 100000L,
                                        compactTargetRows: Long = 1000000L): Unit = {
    val S = graft.operators.Snapshot
    val spark = out.sparkSession
    val latest = S.latestVersion(spark, destDir)
    val already = lastBatchTag(spark, destDir).exists(_ >= batchId)
    if (!already) {
      if (latest == 0)
        S.publishSnapshot(out, destDir, statsCol,
          tag = Some(s"batch=$batchId"))
      else
        S.appendSnapshot(out, destDir, statsCol,
          tag = Some(s"batch=$batchId"))
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
        S.compactSnapshot(spark, destDir, compactMinRows,
          compactTargetRows, tag = Some(s"batch=$batchId"))
        ()
      }
    }
  }

  /** STREAMING MULTI-TABLE TRANSACTIONS — the reference's registration
    * unit of work (a sample property mutation + a dataset registration
    * + their link, ref `register-hlatyping.py:119-128`) kept atomic
    * UNDER A STREAM: each micro-batch stages its writes across N
    * snapshot tables through [[graft.operators.SnapshotTxn]] and
    * commits them at ONE commit point, so no reader — not even one
    * racing the stream — can observe a batch's sample row without its
    * dataset rows. This closes the torn window per-table streaming
    * sinks ([[snapshotStream]] + [[morStream]] side by side) leave
    * between their two independent commits.
    *
    * Exactly-once rides the TXN-manifest tag (`batch=<id>`) — the
    * [[applySnapshotBatch]] replay guard lifted to the log. The tag is
    * atomic with the commit point (it rides the manifest whose publish
    * IS the commit), the checkpoint serializes batches so only the
    * latest batch can ever replay, and a replayed batch probes the
    * log's LAST batch tag ([[graft.operators.SnapshotTxn.lastTagged]]
    * — a downward scan from the head, so a sanctioned batch writer's
    * txn interleaved between the crashed commit and the replay cannot
    * bury the tag out of the guard's sight): a watermark at or above
    * the batch id means already-committed, and the replay just runs
    * recovery (the crash may have landed between the commit point and
    * finalization) and moves on. A crash
    * BEFORE the commit point leaves only staged orphans (no version,
    * no txn — vacuumOrphans reclaims); a crash AFTER it leaves a
    * committed txn that recovery rolls forward. Either way the replay
    * converges to exactly-once table state. The same CHECKPOINT-RESET
    * footgun as [[snapshotStream]] applies: a fresh checkpoint against
    * an existing log restarts batch ids at 0, and every batch at or
    * below the log's watermark SKIPS silently — recycle a txn log for
    * a new feed and its first batches drop. New feed, new log.
    *
    * `stage` receives the open transaction, the micro-batch and the
    * batch id and stages every table write (stagePublish / stageAppend
    * / stageMerge / stageDelete / predicate DML); it must be
    * deterministic per batch. A batch that stages nothing commits
    * nothing. One streaming producer per txn log, and batch writers on
    * enrolled tables route through SnapshotTxn — the log's standing
    * contract. */
  def txnStream(spark: SparkSession, srcDir: String, fileGlob: String,
                txnRoot: String, checkpointDir: String,
                stage: (graft.operators.SnapshotTxn, DataFrame, Long) => Unit,
                maxFilesPerTrigger: Int = 1,
                trigger: Trigger = Trigger.AvailableNow(),
                finish: StreamingQuery => Unit = _.awaitTermination()): Unit = {
    // the stream IS the log's writer driver: claim the writer epoch at
    // start (the Kafka-producer-epoch fencing pattern), so a zombie
    // predecessor driver still holding the log is fenced at its next
    // commit point instead of racing this stream's commits
    graft.operators.SnapshotTxn.claimWriter(spark, txnRoot)
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .option("maxFilesPerTrigger", math.max(maxFilesPerTrigger, 1))
      .parquet(srcDir)
      .writeStream.option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyTxnBatch(spark, txnRoot, batch.toDF(), batchId)(stage)
      }
      .trigger(trigger).start()
    finish(q)
  }

  /** One micro-batch of [[txnStream]], factored out so the replay
    * guard and both crash points are directly testable.
    * `crashAfterCommitPoint` stops at the atomic commit point (the
    * committer "dies" before finalizing) — the kill-injection seam for
    * specs and the q_stream_txn gate. */
  private[graft] def applyTxnBatch(spark: SparkSession, txnRoot: String,
                                   out: DataFrame, batchId: Long,
                                   crashAfterCommitPoint: Boolean = false)
      (stage: (graft.operators.SnapshotTxn, DataFrame, Long) => Unit): Unit = {
    val T = graft.operators.SnapshotTxn
    val S = graft.operators.Snapshot
    // recover FIRST: a replayed batch may follow a crash between the
    // commit point and finalization — enrolled tables' latest versions
    // are only meaningful after the roll-forward, and `stage` reads
    // them (bootstrap-vs-append decisions, MoR bases)
    T.recover(spark, txnRoot)
    val head = T.latestTxn(spark, txnRoot)
    val rootFs = new org.apache.hadoop.fs.Path(txnRoot).getFileSystem(
      spark.sessionState.newHadoopConf())
    // vacuumTxnLog never prunes the head manifest, so a missing head is
    // manual damage — refuse LOUDLY rather than re-commit a batch that
    // may already have landed (a silent bypass here double-applies the
    // batch's writes; lastTagged below would also refuse, this check
    // just names the damage precisely)
    if (head >= 1)
      require(rootFs.exists(new org.apache.hadoop.fs.Path(
          s"$txnRoot/manifest/v$head.txt")),
        s"txn log $txnRoot: head txn $head has no manifest, so whether " +
          s"batch $batchId already committed is undecidable (a silent " +
          "re-commit could double-apply it). vacuumTxnLog now always " +
          "retains the head; a log fully pruned by an OLDER vacuum (or " +
          "by hand) heals by minting a new head — commit one " +
          "transaction through SnapshotTxn from a batch writer, then " +
          "restart the stream")
    // the REPLAY WATERMARK: the last `batch=<j>`-tagged txn anywhere in
    // the log, not just the head. Batch ids are serialized and monotone
    // (Spark's checkpoint replays only the latest batch), so j >= batchId
    // means this batch already committed. Scanning only the head (the
    // r14 guard) had a hole: a batch writer's txn landing between a
    // crashed stream commit and its replay BURIES the batch tag, and a
    // head-only probe would re-stage and re-commit the batch — every
    // stageAppend row twice. The downward scan costs O(foreign txns
    // since the stream's last commit) manifest reads — normally one —
    // and survives vacuum via the fold snapshot's `#tagwm=` watermark.
    val already = T.lastTagged(spark, txnRoot, "batch=")
      .exists(graft.operators.Snapshot
        .parseBatchTag(_, s"txn log $txnRoot") >= batchId)
    if (already) return // replay of a committed batch: recovery ran above
    val t = T.begin(spark, txnRoot)
    stage(t, out, batchId)
    if (!t.hasStaged) return // empty batch: nothing to commit
    if (crashAfterCommitPoint) {
      t.commitNoFinalize(tag = Some(s"batch=$batchId")); ()
    } else {
      t.commit(tag = Some(s"batch=$batchId")); ()
    }
  }

  /** Streaming CDC → Type-2 slowly-changing-dimension history: each
    * micro-batch is shaped to one row per key (`shape`, e.g. last
    * event wins) and folded into the history with
    * [[graft.operators.Catalog.scd2Apply]] at `valid_from = batchId` —
    * the deterministic batch timeline (wall clocks never enter the
    * data). The dest layout is what keeps a year of CDC cheap:
    *
    *   - `open/`   — current row per live key (dimension-sized),
    *                 REWRITTEN per batch;
    *   - `closed/` — immutable history, APPEND-ONLY per-batch delta
    *                 dirs (`delta_<batchId>`), never rewritten.
    *
    * Per-batch I/O is O(open + delta), never O(history): scd2Apply is
    * fed the open slice only, so closed rows never ride through the
    * full-outer join again. Commit is replay-safe against the
    * checkpoint: both outputs are staged under `.stage_<batchId>`,
    * then the closed delta moves into place keyed by batchId (a replay
    * finds it present and skips the move) and the open swap is
    * RECOVERABLE: the old open/ is renamed aside (open_prev_<batchId>)
    * before the new one renames in, and batch entry restores the aside
    * if open/ is missing — so a crash anywhere (including between the
    * two swap renames) re-runs the batch to the same effect, the same
    * contract upsertExactlyOnce keeps. Returns the full history
    * (closed ∪ open) read back from dest. */
  def scd2Stream(spark: SparkSession, srcDir: String, fileGlob: String,
                 destDir: String, checkpointDir: String, keys: Seq[String],
                 shape: DataFrame => DataFrame,
                 maxFilesPerTrigger: Int = 1,
                 trigger: Trigger = Trigger.AvailableNow(),
                 finish: StreamingQuery => Unit = _.awaitTermination()): DataFrame = {
    import org.apache.hadoop.fs.Path
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .option("maxFilesPerTrigger", math.max(maxFilesPerTrigger, 1))
      .parquet(srcDir)
      .writeStream.option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val incoming = shape(batch.toDF())
        val fs = new Path(destDir).getFileSystem(
          spark.sessionState.newHadoopConf())
        val openPath = new Path(s"$destDir/open")
        // Crash recovery for the open/ swap below: the swap moves the old
        // open/ ASIDE (open_prev_<batchId>) before renaming the new one in,
        // so there is no window where the base vanishes. If open/ is
        // missing here, a crash happened between aside-rename and
        // new-rename — restore the newest aside (the pre-batch base) and
        // re-apply; if open/ exists, any leftover asides are from a crash
        // after the new open landed (already-applied) and are dropped.
        val asides = Option(fs.globStatus(new Path(s"$destDir/open_prev_*")))
          .map(_.toSeq).getOrElse(Seq.empty)
        if (!fs.exists(openPath) && asides.nonEmpty) {
          val latest = asides.map(_.getPath)
            .maxBy(_.getName.stripPrefix("open_prev_").toLong)
          // the aside is the ONLY copy of the base here — a silent
          // false from rename followed by the cleanup below would
          // delete it; fail loudly instead and leave it for a retry
          if (!fs.rename(latest, openPath))
            throw new IllegalStateException(
              s"scd2Stream: failed to restore open/ from $latest")
        }
        asides.map(_.getPath).filter(p => fs.exists(p))
          .foreach(p => fs.delete(p, true))
        val open =
          if (fs.exists(openPath)) spark.read.parquet(openPath.toString)
          else incoming.limit(0).withColumn("valid_from", lit(0L))
            .withColumn("valid_to", lit(null).cast("long"))
        val applied = graft.operators.Catalog
          .scd2Apply(open, incoming, keys, batchId).persist()
        val stage = new Path(s"$destDir/.stage_$batchId")
        fs.delete(stage, true)
        applied.filter(col("valid_to") === batchId)
          .write.parquet(s"$stage/closed")
        applied.filter(col("valid_to").isNull)
          .write.parquet(s"$stage/open")
        applied.unpersist()
        // commit: closed delta keyed by batchId (replay skips), then
        // last-wins open swap
        fs.mkdirs(new Path(s"$destDir/closed"))
        val delta = new Path(s"$destDir/closed/delta_$batchId")
        if (!fs.exists(delta) && !fs.rename(new Path(s"$stage/closed"), delta))
          throw new IllegalStateException(
            s"scd2Stream: failed to commit closed delta $delta")
        // Recoverable open swap: old open moves ASIDE first (a crash
        // between the two renames leaves open_prev_<batchId>, restored at
        // next batch entry above), new open renames in, aside dropped
        // last. Every rename result is CHECKED before anything is
        // deleted — Hadoop rename signals failure by returning false,
        // and a silent false here followed by the aside/stage cleanup
        // would delete the only copy of the open history base.
        val prevAside = new Path(s"$destDir/open_prev_$batchId")
        if (fs.exists(openPath)) {
          fs.delete(prevAside, true)
          if (!fs.rename(openPath, prevAside))
            throw new IllegalStateException(
              s"scd2Stream: failed to move $openPath aside to $prevAside")
        }
        if (!fs.rename(new Path(s"$stage/open"), openPath))
          // the base survives at prevAside; next batch entry restores it
          throw new IllegalStateException(
            s"scd2Stream: failed to land new open/ from $stage " +
              s"(base preserved at $prevAside)")
        fs.delete(prevAside, true)
        fs.delete(stage, true)
        ()
      }
      .trigger(trigger).start()
    finish(q)
    val open = spark.read.parquet(s"$destDir/open")
    val fs = new Path(destDir).getFileSystem(spark.sessionState.newHadoopConf())
    val closedPath = new Path(s"$destDir/closed")
    if (fs.exists(closedPath))
      spark.read.option("recursiveFileLookup", "true")
        .parquet(closedPath.toString).unionByName(open)
    else open
  }

  /** §2.10 foreachBatch + idempotent MERGE: each micro-batch upserts
    * into a parquet "catalog" table (last-wins on `keys` via
    * [[graft.operators.Catalog.upsert]]), committed by staging-dir swap.
    * The checkpoint makes re-runs no-ops; the MERGE makes duplicate
    * deliveries harmless — together, exactly-once effect on the table.
    *
    * The dest table is laid out in `nBuckets` fixed hash buckets
    * (`__bucket=<i>/` partition dirs on `pmod(hash(keys), nBuckets)`),
    * and a micro-batch rewrites ONLY the buckets its keys fall in: the
    * read prunes to touched partitions, the merge unions batch rows with
    * just those buckets' rows, and the commit swaps just those bucket
    * dirs. Per-batch I/O is O(touched buckets), not O(catalog) — the
    * read-all + overwrite-all alternative is the one genuine scale-killer
    * in a streaming MERGE. Crash recovery keeps the staging-swap
    * semantics: a complete staging dir (`_SUCCESS`) is replayed bucket by
    * bucket (the per-bucket delete+rename is idempotent — moved buckets
    * leave staging, so a resumed recovery never double-applies), an
    * incomplete one is dropped. */
  def upsertExactlyOnce(spark: SparkSession, srcDir: String, fileGlob: String,
                        destDir: String, checkpointDir: String,
                        keys: Seq[String], nBuckets: Int = 16,
                        tieBreak: Seq[String] = Nil,
                        trigger: Trigger = Trigger.AvailableNow(),
                        finish: StreamingQuery => Unit = _.awaitTermination()): Long = {
    import org.apache.hadoop.fs.Path
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val dest = new Path(destDir)
        val staging = new Path(destDir + ".staging")
        val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
        recoverSwap(fs, dest, staging)
        // The batch feeds TWO passes (touched-bucket collect, then the
        // merge write); without a persist each pass re-scans the micro-
        // batch's source files — doubled ingest I/O at scale (measured:
        // numInputRows exactly 2x the delivered rows).
        val bucketed = batch.toDF().withColumn("__bucket",
          pmod(hash(keys.map(col): _*), lit(nBuckets)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // ≤ nBuckets rows — a bounded driver collect, not O(data).
          val touched = bucketed.select("__bucket").distinct()
            .collect().map(_.getInt(0)).toSeq
          val existing =
            if (fs.exists(dest))
              // Partition pruning: dest is __bucket=<i>/ dirs, so this scan
              // reads only the touched buckets' files.
              spark.read.parquet(destDir)
                .filter(col("__bucket").isin(touched: _*))
            else bucketed.limit(0)
          // without tieBreak, a micro-batch with a repeated key fails
          // loudly (Catalog.upsert's uniqueness guard) rather than
          // committing an arbitrary winner that a replay could flip
          graft.operators.Catalog.upsert(existing, bucketed, keys, tieBreak)
            .write.mode("overwrite").partitionBy("__bucket")
            .parquet(staging.toString)
          commitBuckets(fs, dest, staging)
        } finally { bucketed.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
    finish(q)
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    recoverSwap(fs, dest, new Path(destDir + ".staging"))
    spark.read.parquet(destDir).count()
  }

  /** §2.10 × the retrieval surface: streaming incremental inverted-index
    * maintenance. A document file stream drives
    * [[graft.operators.InvertedIndex.refresh]] once per micro-batch, so
    * a published bucketed index stays queryable and delta-maintained
    * while documents land — the streaming form of q_index_refresh's
    * batch publish→refresh (the index must end indistinguishable from a
    * full rebuild no matter how the stream chunked the docs).
    *
    * Idempotency: refresh is append-only (a replayed delta would
    * double-count df), so each applied batch drops an
    * `_applied/batch-<id>` marker inside `dest` and a redelivered batch
    * id is skipped ([[graft.exec.External.skipDone]]'s pattern, valid
    * within one checkpoint lineage — exactly the restart-after-crash
    * case). The apply itself is a STAGED-SWAP commit (the
    * [[upsertExactlyOnce]] discipline): the merged buckets land in a
    * sealed staging dir first, and the marker travels with the swap —
    * a crash anywhere replays to the same index (see
    * [[applyIndexBatch]]'s crash-point enumeration). */
  def indexStream(spark: SparkSession, srcDir: String, fileGlob: String,
                  dest: String, checkpointDir: String, idCol: String,
                  tokCol: Column, maxDf: Long, maxFilesPerTrigger: Int = 1,
                  trigger: Trigger = Trigger.AvailableNow(),
                  finish: StreamingQuery => Unit = _.awaitTermination()): Unit = {
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = fileStream(spark, schema, fileGlob, srcDir, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        applyIndexBatch(spark, dest, batch.toDF(), batchId, idCol, tokCol, maxDf)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
    finish(q)
  }

  /** Maintain a published inverted index as a FOLLOWER of a snapshot
    * TABLE — [[indexStream]]'s manifest-CDC twin, re-expressed on the
    * shared resumable reader ([[graft.operators.SnapshotCdc.pump]]):
    * each pump window's added documents merge into the index through
    * [[applyIndexBatch]]'s marker-guarded staged swap, with the marker
    * keyed by the window's END VERSION — so a crash between the index
    * commit and the watermark advance replays into a skip, and the
    * index ends indistinguishable from a full rebuild however the
    * versions chunked. The first window (watermark 0 → full snapshot)
    * bootstraps by publishing the built index outright. Same df-cap
    * contract as every refresh path: `maxDf` fixed across the table's
    * life, doc ids append-only. Returns the number of windows applied. */
  def indexSnapshotCdc(spark: SparkSession, srcDir: String, dest: String,
                       checkpointDir: String, idCol: String,
                       tokCol: org.apache.spark.sql.Column, maxDf: Long,
                       nBuckets: Int = 16,
                       maxVersionsPerBatch: Int = Int.MaxValue): Int = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dest).getFileSystem(spark.sessionState.newHadoopConf())
    graft.operators.SnapshotCdc.pump(spark, srcDir, checkpointDir,
        maxVersionsPerBatch) { d =>
      // the bootstrap window is identified by the WINDOW (fromVersion
      // 0 = full snapshot), never by on-disk bucket existence: a crash
      // after publish but before the batch marker leaves buckets on
      // disk, and an existence test would then route the REPLAYED
      // bootstrap window into the merge path — folding the whole
      // corpus into the already-published index (double df, duplicate
      // postings). Re-publishing is idempotent; merging is not.
      if (d.fromVersion == 0) {
        val marker = new Path(s"$dest/_applied/batch-${d.toVersion}")
        // publish-overwrite is replay-idempotent on its own; the marker
        // still lands so a later redelivery of this window skips
        graft.operators.InvertedIndex.publish(
          graft.operators.InvertedIndex.build(d.rows, idCol, tokCol, maxDf),
          dest, nBuckets)
        // a bootstrap resets the index to THIS window's snapshot: any
        // marker from a prior consumer life (full watermark rewind)
        // would make the NEXT windows skip their merge — wipe them
        fs.delete(new Path(s"$dest/_applied"), true)
        fs.mkdirs(new Path(s"$dest/_applied"))
        fs.create(marker, true).close()
      } else
        applyIndexBatch(spark, dest, d.rows, d.toVersion.toLong, idCol,
          tokCol, maxDf)
    }
  }

  /** One micro-batch of [[indexStream]]: marker-guarded refresh.
    * Factored out so the replay guard is directly spec-testable. */
  private[streaming] def applyIndexBatch(spark: SparkSession, dest: String,
                                         batch: DataFrame, batchId: Long,
                                         idCol: String, tokCol: Column,
                                         maxDf: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val marker = new Path(s"$dest/_applied/batch-$batchId")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(s"$dest/.stage_batch_$batchId")
    // Staged-swap commit closing the old "crash between the bucket
    // overwrite and the marker" window: the merge writes ONLY to
    // staging (dest stays pristine and readable), a _marker file seals
    // the staging dir, then the swap moves buckets and finally the
    // marker itself. Every crash point replays to the same state:
    //   - mid-merge: staging has no _marker → dropped, recomputed;
    //   - mid-swap: _marker present → swap FINISHES (never recomputes
    //     over half-swapped buckets — the double-count the in-place
    //     write could not avoid);
    //   - after the marker rename: the batch reads as applied; a stale
    //     staging dir is just deleted.
    def commit(): Unit = {
      val destPath = new Path(dest)
      fs.listStatus(staging)
        .filter(_.getPath.getName.startsWith("__bucket="))
        .foreach { s =>
          val d = new Path(destPath, s.getPath.getName)
          fs.delete(d, true)
          // a silently-false rename here would drop a bucket from the
          // index while the _marker rename still commits the batch as
          // applied — fail loudly BEFORE the marker, so the replay
          // (staging _marker still present) finishes the swap
          if (!fs.rename(s.getPath, d))
            throw new IllegalStateException(
              s"indexStream: bucket swap rename failed for ${s.getPath}")
        }
      fs.mkdirs(new Path(s"$dest/_applied"))
      if (!fs.rename(new Path(staging, "_marker"), marker) &&
          !fs.exists(marker))
        throw new IllegalStateException(
          s"indexStream: failed to commit marker for batch $batchId")
      fs.delete(staging, true)
      ()
    }
    if (fs.exists(marker)) { fs.delete(staging, true); () }
    else if (fs.exists(staging) && fs.exists(new Path(staging, "_marker"))) {
      commit() // finish an interrupted swap; do NOT recompute
    } else {
      fs.delete(staging, true)
      graft.operators.InvertedIndex.refreshStaged(spark, dest,
        staging.toString, batch, idCol, tokCol, maxDf)
      fs.create(new Path(staging, "_marker"), true).close()
      commit()
    }
  }

  /** Commit a complete staging write: swap each staged `__bucket=` dir
    * into dest (delete-then-rename per bucket), then drop staging.
    * Untouched dest buckets are never read or written. */
  private def commitBuckets(fs: org.apache.hadoop.fs.FileSystem,
                            dest: org.apache.hadoop.fs.Path,
                            staging: org.apache.hadoop.fs.Path): Unit = {
    fs.mkdirs(dest)
    fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("__bucket="))
      .foreach { s =>
        val d = new org.apache.hadoop.fs.Path(dest, s.getPath.getName)
        fs.delete(d, true)
        // same loud-failure rule as applyIndexBatch's swap: a false
        // rename must not let the commit proceed with a missing bucket
        if (!fs.rename(s.getPath, d))
          throw new IllegalStateException(
            s"bucket swap rename failed for ${s.getPath}")
      }
    fs.delete(staging, true)
    ()
  }

  /** Repair an interrupted staging swap: a complete staging dir
    * (`_SUCCESS` present) means the previous commit died mid-swap —
    * finish moving its remaining bucket dirs. An incomplete staging dir
    * is a dead partial write — drop it. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                          dest: org.apache.hadoop.fs.Path,
                          staging: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(staging)) {
      val complete = fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))
      if (complete) commitBuckets(fs, dest, staging)
      else fs.delete(staging, true)
    }
    ()
  }

  /** §2.10 exactly-once commit: file-source stream → parquet file sink
    * with a checkpoint. The sink's commit log makes re-runs (restart
    * after crash, accidental double invocation) no-ops instead of
    * duplicates — the engine-native form of the reference's
    * one-transaction-per-upload model. Returns the sink row count. */
  def ingestExactlyOnce(spark: SparkSession, srcDir: String, fileGlob: String,
                        destDir: String, checkpointDir: String): Long = {
    val schema = sourceSchema(spark, srcDir, fileGlob)
    val q = spark.readStream.schema(schema).option("pathGlobFilter", fileGlob)
      .parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(destDir).count()
  }
}
