package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: payloads travel as opaque `binary` columns next to a typed
  * metadata struct, so a 100 TB media table scans/prunes/partitions like
  * any other table and only the decode stage touches bytes.
  *
  * DICOM payloads have a REAL decode: [[graft.sources.Dicom]] is a pure-
  * JVM tag parser (public PS3.10 format) covering the reference's whole
  * anonymization field set — no codec library needed, because that set
  * is all string-VR header data. Pixel-level image/audio decode still
  * needs codecs absent from this environment, so [[decodePartition]]
  * remains a clearly-marked stub for those; the Spark-side plumbing —
  * schema, column shapes, deterministic metadata derivation,
  * per-partition batching seam — is real and is what [[fakeDecode]]
  * exercises end-to-end.
  */
object Multimodal {
  /** Metadata struct the decode stage emits alongside the payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("size_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType)))

  /** Attach an opaque binary payload column (e.g. from `binaryFile`
    * sources — SURVEY §2.1 S1/S10/S11 pattern generalized). */
  def withPayload(df: DataFrame, sourceCol: String): DataFrame =
    df.withColumn("payload", col(sourceCol).cast("binary"))

  /** Deterministic fake decode: metadata derived from the payload's
    * sha256. Stand-in with the exact schema/shape the real codec UDF
    * would produce, so downstream plumbing is testable without codecs. */
  def fakeDecode(payload: Column, mediaType: String): Column = {
    val h = conv(substring(sha2(payload, 256), 1, 8), 16, 10).cast("long")
    struct(lit(mediaType).as("media_type"),
      length(payload).cast("long").as("size_bytes"),
      (pmod(h, lit(1920L)) + lit(1L)).as("width"),
      (pmod(h, lit(1080L)) + lit(1L)).as("height"))
  }

  /** Perceptual average-hash (aHash) over a decoded luminance grid: a
    * 64-bit fingerprint with bit i set iff cell i is brighter than the
    * grid mean — the standard cheap image near-dup signature (the
    * pHash family's baseline member). Takes the grid as `array<long>`
    * (64 cells, 0-255) from the decode stage: with a
    * [[fakeDecode]]-style deterministic grid the whole operator is
    * oracle-replayable, and a REAL decoder slots in at the
    * [[decodePartition]] seam without touching this column math.
    *
    * Engine-portable by construction: the mean test is the integer
    * cross-multiplication `cell·n > Σcells` (no division, no floats),
    * and the bit pack sums per-bit weights in index order so every
    * partial stays inside signed-64 (bits 0..62 total ≤ 2^63−1; bit
    * 63's weight is Long.MinValue added last — the shaHash64/simhash64
    * convention the DuckDB oracle replays). Candidate pairing reuses
    * [[Dedup.simhashPairs]] 16-bit banding unchanged — image near-dup
    * composes from the text-dedup machinery. */
  def averageHash(grid: Column): Column =
    averageHashStaged(grid, size(grid).cast("long"),
      aggregate(grid, lit(0L), (acc, x) => acc + x))

  /** [[averageHash]] with the grid size/total taken as PRE-STAGED
    * columns. Stage them (withColumn) whenever `grid` is itself an
    * expensive expression: a lambda body's free subexpressions are
    * re-evaluated per ELEMENT by the higher-order-function runtime, so
    * `total` embedding a hash-built grid costs O(cells²) hash calls
    * per row — measured as a 10-minute q_phash dump at sf0.1 before
    * staging vs seconds after. Catalyst's CollapseProject keeps staged
    * attributes staged (multi-referenced aliases are not inlined). */
  def averageHashStaged(grid: Column, n: Column, total: Column): Column =
    aggregate(
      zip_with(grid, sequence(lit(0), n.cast("int") - 1), (v, i) =>
        // SQL shiftleft (column shift amount — the DSL overload takes
        // only a literal Int)
        when(v * n > total,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)

  /** Real decode seam: per-partition batched decode through an image /
    * audio codec (the `mapPartitions` analog of a Pandas-UDF batch).
    * STUB — no codec library ships in this environment. */
  def decodePartition(rows: Iterator[Array[Byte]]): Iterator[Row] =
    throw new UnsupportedOperationException(
      "media codec not available in this environment; use fakeDecode for plumbing tests")

  type Row = (String, Long, Long, Long)

  /** Frame-sampling timeline for video rows: one output row per sampled
    * frame at t = 0, strideMs, 2·strideMs, … < duration — the Spark-side
    * shape of ffmpeg `-vf fps=` frame extraction, with the pixel decode
    * left to the [[decodePartition]] seam. The frame grid is an IN-ROW
    * `sequence` explode (⌈duration/stride⌉ elements), so rows_out grows
    * with total video time but there is NO join and NO shuffle — frame
    * rows are born partition-local next to their payload, which is what
    * lets a 1000-executor run feed frame batches straight into a codec
    * UDF without ever exchanging the binary column. Rows with
    * duration < 1 ms carry no frames and are dropped (explicitly, so a
    * malformed duration can't produce a descending sequence). */
  def sampleFrames(df: DataFrame, durationMsCol: Column,
                   strideMs: Long): DataFrame = {
    require(strideMs >= 1, s"need strideMs >= 1; got $strideMs")
    df.withColumn("__dur", durationMsCol.cast("long"))
      .filter(col("__dur") >= 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), expr(s"(__dur - 1) div $strideMs"))))
      .withColumn("t_ms", col("frame_idx") * strideMs)
      .drop("__dur")
  }

  /** OVERLAPPING analysis windows for audio rows: one output row per
    * window [start, start + windowMs) with start = 0, strideMs,
    * 2·strideMs, … while start < duration; the last window clips to
    * the duration (`end_ms = min(start + windowMs, duration)`) so a
    * consumer can batch exact sample ranges into an STFT/VAD codec via
    * the [[decodePartition]] seam. stride < window gives the standard
    * overlapped spectrogram grid; stride = window degenerates to
    * [[sampleFrames]]-style tiling. Same in-row `sequence` explode —
    * no join, no shuffle, windows born next to their payload. */
  def audioWindows(df: DataFrame, durationMsCol: Column,
                   windowMs: Long, strideMs: Long): DataFrame = {
    require(windowMs >= 1 && strideMs >= 1,
      s"need windowMs, strideMs >= 1; got $windowMs/$strideMs")
    df.withColumn("__dur", durationMsCol.cast("long"))
      .filter(col("__dur") >= 1)
      .withColumn("win_idx",
        explode(sequence(lit(0L), expr(s"(__dur - 1) div $strideMs"))))
      .withColumn("start_ms", col("win_idx") * strideMs)
      .withColumn("end_ms", least(col("start_ms") + windowMs, col("__dur")))
      .drop("__dur")
  }
}
