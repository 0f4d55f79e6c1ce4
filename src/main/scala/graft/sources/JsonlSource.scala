package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL ingestion with corrupt-record QUARANTINE — the interchange format
  * most crawl dumps and training corpora actually arrive in (one JSON
  * object per line, usually .jsonl.gz). Two disciplines a 100 TB ingest
  * cannot skip:
  *
  *  1. **Schema is an input, never inferred.** `inferSchema`/default JSON
  *     reading samples or scans the corpus BEFORE the real read (an extra
  *     pass over everything) and infers from whatever malformed lines say
  *     — the caller passes the `StructType` and the read is one pass with
  *     column pruning reaching the parser (Jackson parses only requested
  *     fields).
  *  2. **A malformed line must quarantine, not kill the job — and not
  *     silently vanish.** One bad line in a million-file crawl dump is
  *     CERTAIN; FAILFAST kills hours of work, plain PERMISSIVE nulls the
  *     row and loses the evidence. Here PERMISSIVE + a corrupt-record
  *     column split the read into (good rows, quarantine rows): good rows
  *     carry the schema, quarantine rows carry (`input_file`, `raw`) —
  *     the original line text, so the bad lines can be re-parsed after a
  *     schema fix or reported upstream.
  *
  * One parse pass per branch over the same splittable scan (gzip files
  * read one task per file — the WARC-tier caveat; prefer many files or
  * zstd/bzip2 at scale). A line that parses but MISSES fields is good
  * with nulls (schema evolution's normal case), not quarantined —
  * quarantine is for lines Jackson rejects. Returns (good, quarantine).
  */
object JsonlSource {

  def read(spark: SparkSession, path: String,
           schema: StructType): (DataFrame, DataFrame) = {
    require(schema.nonEmpty, "jsonl read needs at least one schema field")
    require(!schema.fieldNames.contains("_graft_corrupt"),
      "jsonl schema may not contain the reserved column _graft_corrupt")
    val withCorrupt = schema.add("_graft_corrupt", "string")
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_graft_corrupt")
      .json(path)
    val good = raw.filter(col("_graft_corrupt").isNull)
      .drop("_graft_corrupt")
    // Spark refuses a JSON scan whose only referenced column is the
    // corrupt record (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the raw
    // projection must keep one data field referenced: coalesce's second
    // arm is dead (the filter guarantees corrupt is non-null) but not
    // provably so to the optimizer, which keeps the field in the scan.
    val anchor = col(schema.fieldNames.head).cast("string")
    val quarantine = raw.filter(col("_graft_corrupt").isNotNull)
      .select(input_file_name().as("input_file"),
        coalesce(col("_graft_corrupt"), anchor).as("raw"))
    (good, quarantine)
  }
}
