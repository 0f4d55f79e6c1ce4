package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV ingestion with corrupt-record QUARANTINE — [[JsonlSource]]'s
  * disciplines applied to the other interchange format corpora arrive
  * in (metadata sidecars, label tables, URL lists):
  *
  *  1. **Schema is an input, never inferred** — CSV inference costs a
  *     full extra pass and types whatever the first malformed rows
  *     suggest; the caller's `StructType` gives a one-pass read.
  *  2. **A malformed row quarantines with its raw text** — FAILFAST
  *     kills the job on line one-in-a-million, plain PERMISSIVE nulls
  *     fields silently. Univocity's PERMISSIVE + corrupt-record column
  *     splits the read into (good rows under the schema, quarantine
  *     rows carrying `input_file` + the raw line).
  *
  * CSV-specific semantics, pinned by spec: a row with FEWER tokens
  * than the schema QUARANTINES (fields are positional — a short row is
  * genuinely ambiguous, unlike JSONL's named fields, where missing is
  * schema evolution's normal case); an EMPTY trailing field
  * (`"2,beta,"`) is good-with-null; a row whose field fails its type
  * (a word in an int column) quarantines; quoted delimiters/newlines
  * parse per RFC 4180 (multiLine off by default — at 100 TB a quoted
  * newline inside an unsplittable multiLine file is the caller's
  * explicit opt-in, not a silent default).
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = false, delimiter: String = ",",
           multiLine: Boolean = false): (DataFrame, DataFrame) = {
    require(schema.nonEmpty, "csv read needs at least one schema field")
    require(!schema.fieldNames.contains("_graft_corrupt"),
      "csv schema may not contain the reserved column _graft_corrupt")
    val withCorrupt = schema.add("_graft_corrupt", "string")
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_graft_corrupt")
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("multiLine", multiLine.toString)
      .csv(path)
    val good = raw.filter(col("_graft_corrupt").isNull)
      .drop("_graft_corrupt")
    // the quarantine projection must reference EVERY schema field, not
    // just one anchor: CSV column pruning re-parses each row under the
    // pruned schema, and a short row that happens to satisfy the pruned
    // prefix would come back non-corrupt — vanishing from BOTH branches
    // (JSONL doesn't hit this: a malformed line fails under any schema)
    val anchor = concat_ws("",
      schema.fieldNames.map(f => col(f).cast("string")): _*)
    val quarantine = raw.filter(col("_graft_corrupt").isNotNull)
      .select(input_file_name().as("input_file"),
        coalesce(col("_graft_corrupt"), anchor).as("raw"))
    (good, quarantine)
  }
}
