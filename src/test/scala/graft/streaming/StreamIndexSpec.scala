package graft.streaming

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._

/** Streaming incremental index maintenance: however the stream chunks
  * the documents, the final published index must equal a full rebuild,
  * and a replayed micro-batch must not double-count df. */
class StreamIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark scans parquet fast"),
    (1L, "spark joins shuffle data"),
    (2L, "parquet data pruned early"),
    (3L, "joins reuse bucket layout"),
    (4L, "bucket layout avoids shuffle"),
    (5L, "scans vectorize in codegen")
  ).toDF("doc_id", "text")

  private def readIdx(dest: String) =
    spark.read.parquet(dest)
      .select(col("tok"), col("df"), array_join(col("postings"), ",").as("p"))
      .orderBy("tok")

  test("streamed refresh converges to the full rebuild, across micro-batches") {
    val root = java.nio.file.Files.createTempDirectory("graft-sidx").toString
    val toks = tokens(col("text"))
    InvertedIndex.publish(
      InvertedIndex.build(docs.filter(col("doc_id") < 2), "doc_id", toks, 100L),
      s"$root/idx")
    docs.filter(col("doc_id") >= 2).repartition(3)
      .write.parquet(s"$root/in")
    Ingest.indexStream(spark, s"$root/in", "*.parquet", s"$root/idx",
      s"$root/ckpt", "doc_id", toks, 100L)
    val full = InvertedIndex.build(docs, "doc_id", toks, 100L)
      .select(col("tok"), col("df"), array_join(col("postings"), ",").as("p"))
      .orderBy("tok")
    assert(rows(readIdx(s"$root/idx")) === rows(full))
    // restart from the same checkpoint: no new files -> nothing reapplies
    Ingest.indexStream(spark, s"$root/in", "*.parquet", s"$root/idx",
      s"$root/ckpt", "doc_id", toks, 100L)
    assert(rows(readIdx(s"$root/idx")) === rows(full))
  }

  test("a redelivered batch id is skipped (marker guard), df never double-counts") {
    val root = java.nio.file.Files.createTempDirectory("graft-sidx2").toString
    val toks = tokens(col("text"))
    InvertedIndex.publish(
      InvertedIndex.build(docs.filter(col("doc_id") < 4), "doc_id", toks, 100L),
      s"$root/idx")
    val delta = docs.filter(col("doc_id") >= 4)
    Ingest.applyIndexBatch(spark, s"$root/idx", delta, 7L, "doc_id", toks, 100L)
    val after = rows(readIdx(s"$root/idx"))
    // crash-replay of the SAME batch id: guard must make it a no-op
    Ingest.applyIndexBatch(spark, s"$root/idx", delta, 7L, "doc_id", toks, 100L)
    assert(rows(readIdx(s"$root/idx")) === after)
    val dfShuffle = readIdx(s"$root/idx")
      .filter(col("tok") === "shuffle").head().getLong(1)
    assert(dfShuffle == 2L, "df must count docs 1 and 4 exactly once each")
  }

  test("a crash mid-swap (sealed staging left behind) finishes, not recomputes") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("graft-sidx3").toString
    val toks = tokens(col("text"))
    InvertedIndex.publish(
      InvertedIndex.build(docs.filter(col("doc_id") < 4), "doc_id", toks, 100L),
      s"$root/idx")
    val delta = docs.filter(col("doc_id") >= 4)
    // stage the merge exactly as applyIndexBatch would, seal it, but
    // "crash" before any bucket moves — then replay the batch
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(s"$root/idx/.stage_batch_3")
    InvertedIndex.refreshStaged(spark, s"$root/idx", staging.toString,
      delta, "doc_id", toks, 100L)
    fs.create(new Path(staging, "_marker"), true).close()
    val before = rows(readIdx(s"$root/idx")) // dest untouched by staging
    assert(before.nonEmpty)
    Ingest.applyIndexBatch(spark, s"$root/idx", delta, 3L, "doc_id", toks, 100L)
    // the recovery path must land the SAME index a clean apply produces
    val full = InvertedIndex.build(docs, "doc_id", toks, 100L)
      .select(col("tok"), col("df"), array_join(col("postings"), ",").as("p"))
      .orderBy("tok")
    assert(rows(readIdx(s"$root/idx")) === rows(full))
    assert(!fs.exists(staging), "staging must be cleaned up")
    assert(fs.exists(new Path(s"$root/idx/_applied/batch-3")))
    // a second replay after full commit is a pure no-op
    Ingest.applyIndexBatch(spark, s"$root/idx", delta, 3L, "doc_id", toks, 100L)
    assert(rows(readIdx(s"$root/idx")) === rows(full))
  }
}
