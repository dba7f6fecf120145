package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-arrival sources (SURVEY §2.1 S1/S2/S12).
  *
  * The reference's unit of ingestion is "a folder appeared in a dropbox
  * and its marker file exists" (plugin.properties
  * `incoming-data-completeness-condition = marker-file`). Spark-native:
  * `binaryFile` scans with glob filters; the marker gate is a broadcast
  * semi-join of data files against marker rows — pure metadata, no
  * payload reads (binaryFile only materializes `content` when selected).
  */
object Files {
  /** S1: enumerate a dropbox directory (path, length, modificationTime,
    * content-on-demand). */
  def binaryScan(spark: SparkSession, dir: String,
                 glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** S2 support: list `<markerPrefix>*` marker files. Markers are
    * dot-prefixed (the reference's `.MARKER_is_finished_*`), and Hadoop
    * file sources silently hide `.`/`_`-prefixed paths — so markers are
    * listed through the FileSystem API directly. This is a metadata
    * listing proportional to upload count, not payload size. */
  def listMarkers(spark: SparkSession, dir: String,
                  markerPrefix: String = ".MARKER_is_finished_"): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val found = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      // Path.toString matches the URI form binaryFile puts in `path`
      // (e.g. file:/tmp/...), so the dirs compare equal downstream.
      if (f.getPath.getName.startsWith(markerPrefix))
        found += f.getPath.toString
    }
    found.toSeq.toDF("marker_path")
  }

  /** S2: keep only data files whose upload is complete — i.e. a sibling
    * `<markerPrefix><entry>` marker names the file itself or an ancestor
    * folder (create-register-textfile/script.py:12-16 writer side).
    *
    * Shape: each file explodes into its O(depth) (ancestor-dir, next-
    * segment) pairs, which equi-join the marker keys — the containment
    * test as a hash join, never a nested-loop scan of files x markers.
    * Marker count is bounded by upload count, so the key side
    * broadcasts; matched paths are distinct-ed before the final semi
    * join so multi-marker matches can't duplicate files. */
  def markerGated(files: DataFrame, markers: DataFrame,
                  markerPrefix: String = ".MARKER_is_finished_"): DataFrame = {
    val markerKeys = markers
      .withColumn("__mname", element_at(split(col("marker_path"), "/"), -1))
      .select(
        regexp_replace(col("marker_path"), "/[^/]*$", "").as("__mdir"),
        expr(s"substring(__mname, ${markerPrefix.length + 1})").as("__target"))
      .distinct()
    // (prefix-dir, entry) for every split point: i = size-1 is (parent
    // dir, filename) — a marker naming the file; smaller i are ancestor
    // folders — a marker naming the enclosing upload.
    val candidates = files.select(col("path"), explode(expr(
        """transform(sequence(1, size(split(path, '/')) - 1),
          |  i -> struct(array_join(slice(split(path, '/'), 1, i), '/') AS d,
          |              element_at(split(path, '/'), i + 1) AS e))""".stripMargin))
        .as("__c"))
      .select(col("path"), col("__c.d").as("__dir"), col("__c.e").as("__entry"))
    val matched = candidates
      .join(broadcast(markerKeys),
        col("__dir") === col("__mdir") && col("__entry") === col("__target"),
        "left_semi")
      .select("path").distinct()
    files.join(matched, Seq("path"), "left_semi")
  }

  /** S12: derive structure columns from path segments under a base dir —
    * the Nanopore run-tree shape (run/sample/kind) without a bespoke
    * parser (register-nanopore.py:402-415 consumes the same projection). */
  def pathSegments(files: DataFrame, baseDir: String,
                   names: Seq[String]): DataFrame = {
    val rel = regexp_replace(col("path"),
      "^.*" + java.util.regex.Pattern.quote(baseDir.stripSuffix("/")) + "/", "")
    val segs = split(rel, "/")
    names.zipWithIndex.foldLeft(files.withColumn("__segs", segs)) {
      case (df, (n, i)) => df.withColumn(n, get(col("__segs"), lit(i)))
    }.drop("__segs")
  }
}
