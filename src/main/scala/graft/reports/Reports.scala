package graft.reports

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's reporting plugins as named report queries (SURVEY §7
  * step 7). Each plugin loops code-by-code through a query service and a
  * tableBuilder; here each is ONE declarative query over the
  * corresponding table — same columns, all codes at once.
  */
object Reports {
  /** query-files/script.py:1-42: per-dataset file listing from the
    * path-info DB — "original"/"" rows dropped, `folder` = second-to-last
    * path segment when nested. `files` is the path-info table (read via
    * [[graft.sources.Jdbc.readTable]] in production, any DataFrame in
    * tests); expected columns: data_set_code, relative_path, file_name,
    * size_in_bytes, last_modified. */
  def fileReport(files: DataFrame, codes: Seq[String]): DataFrame = {
    val segs = split(col("relative_path"), "/")
    files
      .filter(col("data_set_code").isin(codes: _*))
      .filter(!col("relative_path").isin("original", ""))
      .withColumn("folder",
        when(size(segs) > 1, element_at(segs, -2)).otherwise(lit("")))
      .select(col("data_set_code"), col("relative_path"), col("file_name"),
        col("size_in_bytes"), col("folder"), col("last_modified"))
  }

  /** get-property-tsv/script.py:21-29: (code, external id, secondary
    * name, properties xml) per requested sample, from a samples table
    * with a `props` map column (the property bag). */
  def propertyTsv(samples: DataFrame, codeCol: String, codes: Seq[String]): DataFrame =
    samples
      .filter(col(codeCol).isin(codes: _*))
      .select(col(codeCol).as("code"),
        element_at(col("props"), "Q_EXTERNALDB_ID").as("external_id"),
        element_at(col("props"), "Q_SECONDARY_NAME").as("secondary_name"),
        element_at(col("props"), "Q_PROPERTIES").as("xml"))

  /** get-parentmap/script.py:21-30: (child, parent) rows for the
    * requested codes; parents arrive as /SPACE/CODE identifiers and are
    * reduced to their last path segment. */
  def parentMap(edges: DataFrame, codes: Seq[String]): DataFrame =
    edges
      .filter(col("child").isin(codes: _*))
      .select(col("child"),
        element_at(split(col("parent"), "/"), -1).as("parent"))
}
