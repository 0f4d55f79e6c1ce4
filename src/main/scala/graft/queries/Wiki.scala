package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.WikiFunctions

/** Wiki-cleaning over the documents corpus. The corpus is plain text, so
  * `clean` must be an exact identity on it — which the oracle checks by
  * comparing cleaned length to raw length (the markup-transformation
  * semantics themselves are fixture-tested against the reference in
  * WikiMarkupSpec/WikiPipelineSpec).
  */
object Wiki {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w02_clean_stats" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(WikiFunctions.wiki_clean(col("text"))).as("clean_len"),
          length(WikiFunctions.wiki_compact(col("text")).getItem(0)).as("first_line_len"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    // clean() and compact() are identity on markup-free single-line text.
    "w02_clean_stats" ->
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS INTEGER) AS clean_len,
        |  CAST(LENGTH(text) AS INTEGER) AS first_line_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
