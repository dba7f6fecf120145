package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diffing — the row-level regression report between two runs
  * of the same pipeline (yesterday's publish vs today's): which keys
  * were added, removed, or changed. At 100 TB the trick is that the
  * full-outer join never carries the rows themselves: each side is
  * projected to (key, 32-byte fingerprint) in its scan stage, so the
  * shuffle volume is keys + a constant, independent of row width. Two
  * co-bucketed snapshots (the q_bucketjoin layout) diff with no
  * exchange at all.
  */
object Snapshot {
  /** sha256 fingerprint over `cols` in the given order. Null-safe: each
    * column encodes as `0` (null) or `1`+value, fields joined with
    * `\u0001` — a null never collides with any string value. (A value
    * containing `\u0001` could straddle fields; acceptable for the
    * fingerprint's regression-report purpose and documented here.)
    * Callers pick engine-portable renderings for the compared columns
    * (integral/string, not raw doubles) when the diff must replay
    * cross-engine. */
  def rowFingerprint(cols: Seq[Column]): Column =
    sha2(concat_ws("\u0001", cols.map(c =>
      when(c.isNull, lit("0")).otherwise(concat(lit("1"), c.cast("string")))): _*),
      256)

  /** Row diff of `after` vs `before` on `keyCols`, comparing
    * `compareCols` (name → expression over that side's row): one
    * full-outer join of the two (key, fingerprint) projections,
    * classification `added` / `removed` / `changed` (unchanged rows are
    * dropped). Keys must be unique per side — the join would otherwise
    * fan out; violations surface as duplicate keys in the report. */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
           compareCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compared column")
    def side(d: DataFrame, fp: String) =
      d.select(keyCols.map(col) :+ rowFingerprint(compareCols).as(fp): _*)
    side(before, "__fp_b")
      .join(side(after, "__fp_a"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__fp_b").isNull, "added")
          .when(col("__fp_a").isNull, "removed")
          .when(col("__fp_b") =!= col("__fp_a"), "changed")
          .otherwise("same"))
      .filter(col("change") =!= "same")
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  // ------------------------------------------------------- time travel
  /** Manifest-based snapshot isolation (Iceberg-lite): every publish
    * writes IMMUTABLE data files under `dest/data/v<k>/` and an
    * atomic manifest `dest/manifest/v<k>.txt` listing exactly the
    * files that version comprises. Readers resolve a version's
    * manifest and read only its files — so version k stays readable
    * (bit-identical) forever, regardless of later publishes, and a
    * reader never sees a half-written version (the manifest appears
    * via rename, after every data file it names is complete). This is
    * the mechanism behind time travel, reproducible training-data
    * snapshots ("the exact corpus run X trained on"), and safe
    * concurrent publish-while-read.
    *
    * [[appendSnapshot]] is where the layout earns its keep at 100 TB:
    * the new manifest lists the PREVIOUS version's files plus the new
    * delta's — appending a day's data to a petabyte table rewrites
    * nothing and the manifest grows by one line per new file. (Full
    * rewrites stay available via [[publishSnapshot]]; bucket-level
    * REPLACEMENT composes with the upsertExactlyOnce bucket layout —
    * deliberately not duplicated here.) */
  def publishSnapshot(df: DataFrame, destDir: String): Int =
    commitVersion(df, destDir, carryForward = false)

  /** New version = previous version's files + `df` written as a delta.
    * Fails if no version exists yet (append needs a base). */
  def appendSnapshot(df: DataFrame, destDir: String): Int = {
    require(latestVersion(df.sparkSession, destDir) >= 1,
      s"appendSnapshot needs an existing version under $destDir")
    commitVersion(df, destDir, carryForward = true)
  }

  private def commitVersion(df: DataFrame, destDir: String,
                            carryForward: Boolean): Int = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val fs = new Path(destDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val prev = latestVersion(spark, destDir)
    val v = prev + 1
    val dataDir = new Path(s"$destDir/data/v$v")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val newFiles = fs.listStatus(dataDir)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(st => s"data/v$v/${st.getPath.getName}")
      .sorted
    val carried =
      if (carryForward && prev >= 1) manifestLines(spark, destDir, prev)
      else Seq.empty
    val manifestDir = new Path(s"$destDir/manifest")
    fs.mkdirs(manifestDir)
    val tmp = new Path(s"$destDir/manifest/.tmp_v$v")
    val out = fs.create(tmp, true)
    out.write((carried ++ newFiles).mkString("\n").getBytes("UTF-8"))
    out.close()
    fs.rename(tmp, new Path(s"$destDir/manifest/v$v.txt"))
    v
  }

  private def manifestLines(spark: org.apache.spark.sql.SparkSession,
                            destDir: String, v: Int): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(destDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val in = fs.open(new Path(s"$destDir/manifest/v$v.txt"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Highest committed version, 0 if none. A `.tmp_` manifest (crashed
    * publish) is invisible — commit is the rename. */
  def latestVersion(spark: org.apache.spark.sql.SparkSession,
                    destDir: String): Int = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(destDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val dir = new Path(s"$destDir/manifest")
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".txt") =>
        s.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)
  }

  /** Read version `v` exactly as published — only the manifest's files. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   destDir: String, v: Int): DataFrame = {
    val files = manifestLines(spark, destDir, v).map(f => s"$destDir/$f")
    require(files.nonEmpty, s"version $v under $destDir is empty/unknown")
    spark.read.parquet(files: _*)
  }
}
