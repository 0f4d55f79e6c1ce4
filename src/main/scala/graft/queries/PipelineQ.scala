package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.CorpusPipeline

/** The composed curation pipeline as a driver query. Rows-only: the
  * near-dedup stage is MinHash-based (not DuckDB-expressible); every stage
  * is individually oracle-gated through its own query (t01/t02/d01/d06/t07)
  * and the composition is spec-tested with planted defects.
  */
object PipelineQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L22: full curation over the documents table, benchmark = ids < 20.
    "c01_curate" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.curate(
        docs.filter(col("doc_id") >= 20), "text", "doc_id",
        CorpusPipeline.Config(
          langs = Set("en", "fr", "es", "de", "zh", "und"),
          minQuality = 0.3, nearDupThreshold = 0.7, contaminationNgram = 5),
        benchmark = Some(docs.filter(col("doc_id") < 20)))
        .select(col("doc_id"), col("lang"), round(col("quality"), 4).as("quality"),
          col("split"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map.empty
}
