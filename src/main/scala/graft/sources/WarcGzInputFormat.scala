package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Splittable InputFormat for real Common Crawl `.warc.gz` archives —
  * per-RECORD gzip members (ISO 28500 recommendation; what every CC
  * segment ships). The stock Hadoop gzip codec treats the whole file as
  * one unsplittable stream (one task per ~1 GB archive — the recode
  * trade the WARC source used to document); member boundaries make the
  * format block-parallel WITHOUT a recode pass: each task seeks to its
  * split offset, resynchronizes on the next gzip member header, and
  * emits one decompressed member (= one WARC record chunk) per value.
  *
  * Resynchronization is the classic scan-and-validate: a candidate is a
  * `1F 8B 08` magic with zero reserved flag bits, ACCEPTED only when the
  * full member inflates cleanly, its CRC32 and ISIZE trailer check out,
  * and the decompressed payload starts with `WARC/` — compressed bytes
  * that merely contain the magic fail one of those and the scan moves
  * on. A member belongs to the split containing its first byte, so every
  * member is read exactly once across tasks. Garbage between members
  * (truncated uploads, corrupt blocks) is skipped by rescanning, never a
  * task failure — the WikiXmlSource/WarcSource degradation contract.
  *
  * Values are the decompressed member bytes as Hadoop `Text` (UTF-8
  * replacement decode downstream — the batch reader's existing text
  * trade); keys are the member's byte offset in the archive.
  */
class WarcGzInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(context: JobContext, file: Path): Boolean = true
  override def createRecordReader(split: InputSplit,
                                  ctx: TaskAttemptContext): RecordReader[LongWritable, Text] =
    new WarcGzRecordReader
}

private class WarcGzRecordReader extends RecordReader[LongWritable, Text] {
  private var in: FSDataInputStream = _
  private var start = 0L
  private var end = 0L
  private var fileLen = 0L
  private var pos = -1L
  private val key = new LongWritable()
  private val value = new Text()

  override def initialize(split: InputSplit, ctx: TaskAttemptContext): Unit = {
    val fs = split.asInstanceOf[FileSplit]
    start = fs.getStart
    end = start + fs.getLength
    val file = fs.getPath
    val hfs = file.getFileSystem(ctx.getConfiguration)
    fileLen = hfs.getFileStatus(file).getLen
    in = hfs.open(file)
    // first split owns offset 0 directly; later splits resync forward
    pos = if (start == 0L) 0L else findMember(start)
  }

  override def nextKeyValue(): Boolean = {
    while (pos >= 0 && pos < end) {
      readMember(pos) match {
        case Some((bytes, consumed)) if isWarc(bytes) =>
          key.set(pos)
          value.set(bytes, 0, bytes.length)
          pos += consumed
          return true
        case Some((_, consumed)) =>
          // a valid gzip member that is not a WARC record (foreign
          // concatenated content) — skip it, stay in member cadence
          pos += consumed
        case None =>
          // not a member start (mid-file corruption): resynchronize
          pos = findMember(pos + 1)
      }
    }
    false
  }

  private def isWarc(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == 'W' && bytes(1) == 'A' &&
      bytes(2) == 'R' && bytes(3) == 'C' && bytes(4) == '/'

  /** Scan forward from `from` for the next offset (< split end) where a
    * fully-validated WARC gzip member begins; -1 when none.
    */
  private def findMember(from: Long): Long = {
    var base = from
    val buf = new Array[Byte](1 << 16)
    while (base < end) {
      in.seek(base)
      val want = math.min(buf.length.toLong, fileLen - base).toInt
      if (want <= 0) return -1L
      var got = 0
      while (got < want) {
        val n = in.read(buf, got, want - got)
        if (n < 0) return -1L
        got += n
      }
      var i = 0
      // overlap guard: a magic straddling the buffer edge is caught by
      // restarting the next window 2 bytes early
      while (i < got - 2) {
        if ((buf(i) & 0xFF) == 0x1F && (buf(i + 1) & 0xFF) == 0x8B &&
            buf(i + 2) == 8) {
          val cand = base + i
          if (cand < end && validates(cand)) return cand
        }
        i += 1
      }
      if (base + got >= fileLen) return -1L
      base += math.max(1, got - 2)
    }
    -1L
  }

  private def validates(offset: Long): Boolean =
    readMember(offset).exists { case (bytes, _) => isWarc(bytes) }

  /** Decompress ONE gzip member starting at `offset`: manual header
    * parse (magic, CM=8, FLG with reserved bits clear, optional
    * FEXTRA/FNAME/FCOMMENT/FHCRC fields), raw-deflate inflate, and the
    * 8-byte CRC32+ISIZE trailer verified against the produced bytes.
    * Returns (decompressed, total member length) or None when anything
    * is inconsistent — the validation that makes resynchronization safe.
    */
  private def readMember(offset: Long): Option[(Array[Byte], Long)] = {
    if (offset + 18 > fileLen) return None // header + trailer minimum
    in.seek(offset)
    val hdr = new Array[Byte](10)
    if (!readFully(hdr, 10)) return None
    if ((hdr(0) & 0xFF) != 0x1F || (hdr(1) & 0xFF) != 0x8B || hdr(2) != 8)
      return None
    val flg = hdr(3) & 0xFF
    if ((flg & 0xE0) != 0) return None
    var headerLen = 10L
    if ((flg & 0x04) != 0) { // FEXTRA
      val x = new Array[Byte](2)
      if (!readFully(x, 2)) return None
      val xlen = (x(0) & 0xFF) | ((x(1) & 0xFF) << 8)
      if (!skipFully(xlen)) return None
      headerLen += 2 + xlen
    }
    if ((flg & 0x08) != 0) headerLen += { // FNAME
      val n = skipZeroTerminated(); if (n < 0) return None; n
    }
    if ((flg & 0x10) != 0) headerLen += { // FCOMMENT
      val n = skipZeroTerminated(); if (n < 0) return None; n
    }
    if ((flg & 0x02) != 0) { // FHCRC
      if (!skipFully(2)) return None
      headerLen += 2
    }
    val inf = new java.util.zip.Inflater(true)
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val crc = new java.util.zip.CRC32()
      val inBuf = new Array[Byte](1 << 16)
      val outBuf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val n = in.read(inBuf)
          if (n < 0) return None // truncated member
          inf.setInput(inBuf, 0, n)
        }
        val m =
          try inf.inflate(outBuf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (m > 0) { out.write(outBuf, 0, m); crc.update(outBuf, 0, m) }
        else if (inf.needsDictionary()) return None
      }
      val trailerAt = offset + headerLen + inf.getBytesRead
      if (trailerAt + 8 > fileLen) return None
      in.seek(trailerAt)
      val tr = new Array[Byte](8)
      if (!readFully(tr, 8)) return None
      val crcStored = le32(tr, 0)
      val isize = le32(tr, 4)
      if ((crc.getValue & 0xFFFFFFFFL) != crcStored) return None
      if ((out.size().toLong & 0xFFFFFFFFL) != isize) return None
      Some((out.toByteArray, headerLen + inf.getBytesRead + 8))
    } finally inf.end()
  }

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def readFully(buf: Array[Byte], len: Int): Boolean = {
    var got = 0
    while (got < len) {
      val n = in.read(buf, got, len - got)
      if (n < 0) return false
      got += n
    }
    true
  }

  private def skipFully(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) return false
      left -= s
    }
    true
  }

  /** Skip a zero-terminated field; returns bytes consumed (incl. the
    * terminator) or -1 on EOF / unreasonable length.
    */
  private def skipZeroTerminated(): Long = {
    var n = 0L
    while (n < (1L << 16)) {
      val b = in.read()
      if (b < 0) return -1L
      n += 1
      if (b == 0) return n
    }
    -1L
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (math.max(pos, start) - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
