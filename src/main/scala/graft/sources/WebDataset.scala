package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard interchange for the media tier — the
  * POSIX-tar-of-per-sample-files layout multimodal training loaders
  * stream natively (a PUBLIC format: a sample is the run of consecutive
  * files sharing a basename "key", so `000042.jpg` + `000042.json` is
  * one sample; shards are plain ustar archives read sequentially).
  *
  * This module owns the tar mechanics; the atomic versioned publish
  * rides [[Warehouse.publishShards]]'s existing commit protocol with
  * `format = "webdataset"` — staging/reservation, landed-file manifest,
  * rename-or-manifest commit all unchanged.
  *
  * Row → sample mapping:
  *  - `content` (binary) + `mime` columns, when present and non-null,
  *    become `<key>.<ext>` with the extension from [[extForMime]]
  *    (unknown mimes land as `.bin` — loaders key decoders off the
  *    extension, so the mapping is part of the contract);
  *  - every OTHER column (shard/key/content/mime excluded) goes into
  *    `<key>.json` as a deterministic JSON object (keys sorted, fixed
  *    formatting) — byte-stable so round-trip specs and content hashes
  *    are meaningful.
  *
  * Scale shape: one task writes whole shards (rows are hash-partitioned
  * by the shard column and sorted by (shard, key) within partitions), so
  * an N-shard publish is N sequential tar streams spread over the
  * executors with no driver involvement; task retries re-create their
  * tars under temp names and commit per-file with a rename, so
  * speculative or retried attempts never interleave bytes in a landed
  * tar. Reading back is one flatMap over the tar file list.
  */
object WebDataset {

  /** mime → sample file extension (the loader-facing decode contract). */
  val extForMime: Map[String, String] = Map(
    "image/png" -> "png", "image/jpeg" -> "jpg", "image/gif" -> "gif",
    "image/bmp" -> "bmp", "image/webp" -> "webp",
    "image/x-portable-pixmap" -> "ppm",
    "image/x-portable-graymap" -> "pgm",
    "image/x-portable-bitmap" -> "pbm",
    "audio/wav" -> "wav", "audio/aiff" -> "aiff", "audio/basic" -> "au",
    "audio/mpeg" -> "mp3", "audio/ogg" -> "ogg",
    "video/mp4" -> "mp4", "video/webm" -> "webm",
    "text/plain" -> "txt")

  /** extension → mime, for read-back (bin → null: unknown). */
  val mimeForExt: Map[String, String] = extForMime.map(_.swap)

  private def extOf(mime: String): String =
    if (mime == null) "bin" else extForMime.getOrElse(mime, "bin")

  /** Deterministic JSON for a row's metadata columns: keys sorted,
    * numbers/booleans bare, strings escaped, binaries base64, null
    * skipped. Stable across runs — the round-trip identity the publish
    * spec pins depends on it.
    */
  private[sources] def metaJson(names: Seq[String], row: Row,
                                idx: Map[String, Int]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    names.sorted.flatMap { n =>
      val i = idx(n)
      if (row.isNullAt(i)) None
      else Some(row.get(i) match {
        case s: String => s""""$n":"${esc(s)}""""
        case b: Array[Byte] =>
          s""""$n":"${java.util.Base64.getEncoder.encodeToString(b)}""""
        case b: Boolean => s""""$n":$b"""
        case v => s""""$n":$v"""
      })
    }.mkString("{", ",", "}")
  }

  /** Write `df` as one tar per distinct `shardCol` value under `dir`
    * (`shard-<value>.tar`), samples keyed by `keyCol`. Returns nothing;
    * call through [[Warehouse.publishShards]] for the committed form.
    */
  private[sources] def writeShardTars(df: DataFrame, dir: String,
                                      shardCol: String,
                                      keyCol: String): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val shardIdx = schema.fieldIndex(shardCol)
    val keyIdx = schema.fieldIndex(keyCol)
    val hasContent = schema.fieldNames.contains("content") &&
      schema.fieldNames.contains("mime")
    val contentIdx = if (hasContent) schema.fieldIndex("content") else -1
    val mimeIdx = if (hasContent) schema.fieldIndex("mime") else -1
    val metaNames = schema.fieldNames.toSeq
      .filterNot(n => n == shardCol || n == keyCol ||
        (hasContent && (n == "content" || n == "mime")))
    val metaIdx = metaNames.map(n => n -> schema.fieldIndex(n)).toMap
    // Hadoop Configuration is not serializable: ship its entries and
    // rebuild per task (public-API route to executor-side FS access)
    val confEntries = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(keyCol))
      .foreachPartition { rows: Iterator[Row] =>
        import org.apache.commons.compress.archivers.tar.{
          TarArchiveEntry, TarArchiveOutputStream}
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(conf)
        val attempt = org.apache.spark.TaskContext.get() match {
          case null => "driver"
          case tc => s"${tc.partitionId()}-${tc.taskAttemptId()}"
        }
        var curShard: String = null
        var curTmp: org.apache.hadoop.fs.Path = null
        var curOut: TarArchiveOutputStream = null
        def closeCurrent(): Unit = if (curOut != null) {
          curOut.finish(); curOut.close()
          val fin = new org.apache.hadoop.fs.Path(base,
            s"shard-$curShard.tar")
          // first fully-written attempt wins; a loser deletes its temp
          if (!fs.rename(curTmp, fin)) fs.delete(curTmp, false)
          curOut = null; curTmp = null; curShard = null
        }
        def entry(name: String, bytes: Array[Byte]): Unit = {
          val e = new TarArchiveEntry(name)
          e.setSize(bytes.length.toLong)
          e.setModTime(0L) // deterministic archives byte-for-byte
          curOut.putArchiveEntry(e)
          curOut.write(bytes)
          curOut.closeArchiveEntry()
        }
        for (row <- rows) {
          val shard = String.valueOf(row.get(shardIdx))
          if (shard != curShard) {
            closeCurrent()
            curShard = shard
            curTmp = new org.apache.hadoop.fs.Path(base,
              s"_tmp-$attempt-shard-$shard.tar")
            curOut = new TarArchiveOutputStream(fs.create(curTmp, true))
            curOut.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          }
          val key = String.valueOf(row.get(keyIdx))
          if (hasContent && !row.isNullAt(contentIdx)) {
            val mime =
              if (row.isNullAt(mimeIdx)) null else row.getString(mimeIdx)
            entry(s"$key.${extOf(mime)}",
              row.get(contentIdx).asInstanceOf[Array[Byte]])
          }
          entry(s"$key.json",
            metaJson(metaNames, row, metaIdx).getBytes("UTF-8"))
        }
        closeCurrent()
      }
  }

  /** Read landed shard tars back as one row per sample FILE:
    * (shard, key, ext, bytes) — the raw WebDataset view. Group by
    * (shard, key) for the per-sample map; [[readSamples]] does exactly
    * that. Distributed: the driver only lists the tar paths.
    */
  def readFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tars = fs.listStatus(base).map(_.getPath)
      .filter(p => p.getName.startsWith("shard-") &&
        p.getName.endsWith(".tar"))
      .map(_.toString).toSeq.sorted
    val confEntries = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    spark.sparkContext
      .parallelize(tars, math.max(1, math.min(tars.size, 64)))
      .flatMap { path =>
        import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(path)
        val shard = p.getName.stripPrefix("shard-").stripSuffix(".tar")
        val in = new TarArchiveInputStream(
          p.getFileSystem(conf).open(p))
        val out = Seq.newBuilder[(String, String, String, Array[Byte])]
        try {
          var e = in.getNextEntry
          while (e != null) {
            val bytes = in.readAllBytes()
            val dot = e.getName.lastIndexOf('.')
            val (key, ext) =
              if (dot < 0) (e.getName, "")
              else (e.getName.substring(0, dot), e.getName.substring(dot + 1))
            out += ((shard, key, ext, bytes))
            e = in.getNextEntry
          }
        } finally in.close()
        out.result()
      }
      .toDF("shard", "key", "ext", "bytes")
  }

  /** One row per SAMPLE: (shard, key, files map&lt;ext, bytes&gt;). */
  def readSamples(spark: SparkSession, dir: String): DataFrame =
    readFiles(spark, dir)
      .groupBy(col("shard"), col("key"))
      .agg(map_from_entries(collect_list(struct(col("ext"), col("bytes"))))
        .as("files"))

  /** Per-shard landed SAMPLE counts (distinct keys per tar) — the
    * manifest input: counts what landed in the archives, not what the
    * plan intended.
    */
  private[sources] def landedCounts(spark: SparkSession,
                                    dir: String): Seq[(String, Long)] =
    readFiles(spark, dir)
      .select(col("shard"), col("key")).distinct()
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
}
