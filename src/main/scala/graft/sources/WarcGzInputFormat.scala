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
  * Hot-path mechanics (CC members are typically small, so per-member
  * constants dominate): all reads go through ONE sequential 64 KB cursor
  * buffer — the stream seeks only at split start and after corruption
  * rescans, consecutive members decode with zero seeks — and ONE
  * `Inflater` is reset per member instead of allocated (native
  * init/free per 2 KB member is the cost that would make the splittable
  * path lose to the serial codec).
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
  private val inf = new java.util.zip.Inflater(true)
  private val outBuf = new Array[Byte](1 << 16)

  // sequential cursor buffer: buf(bufPos..bufLen) holds file bytes
  // starting at file offset bufFileOff + bufPos
  private val buf = new Array[Byte](1 << 16)
  private var bufFileOff = 0L
  private var bufLen = 0
  private var bufPos = 0

  private def fileOffset: Long = bufFileOff + bufPos

  /** Position the cursor; a real stream seek only when leaving the
    * buffered window.
    */
  private def seekTo(off: Long): Unit = {
    if (off >= bufFileOff && off <= bufFileOff + bufLen)
      bufPos = (off - bufFileOff).toInt
    else {
      in.seek(off)
      bufFileOff = off; bufLen = 0; bufPos = 0
    }
  }

  /** Slide the unread tail to the front and read more; false at EOF. */
  private def refill(): Boolean = {
    val rem = bufLen - bufPos
    if (rem > 0) System.arraycopy(buf, bufPos, buf, 0, rem)
    bufFileOff += bufPos
    bufPos = 0; bufLen = rem
    val n = in.read(buf, bufLen, buf.length - bufLen)
    if (n <= 0) false else { bufLen += n; true }
  }

  private def readByte(): Int =
    if (bufPos < bufLen || refill()) { val b = buf(bufPos) & 0xFF; bufPos += 1; b }
    else -1

  private def readBytes(dst: Array[Byte], len: Int): Boolean = {
    var got = 0
    while (got < len) {
      if (bufPos >= bufLen && !refill()) return false
      val take = math.min(len - got, bufLen - bufPos)
      System.arraycopy(buf, bufPos, dst, got, take)
      bufPos += take; got += take
    }
    true
  }

  private def skipBytes(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      if (bufPos >= bufLen && !refill()) return false
      val take = math.min(left, (bufLen - bufPos).toLong).toInt
      bufPos += take; left -= take
    }
    true
  }

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
        case Some(bytes) if isWarc(bytes) =>
          key.set(pos)
          value.set(bytes, 0, bytes.length)
          pos = fileOffset
          return true
        case Some(_) =>
          // a valid gzip member that is not a WARC record (foreign
          // concatenated content) — skip it, stay in member cadence
          pos = fileOffset
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
    seekTo(from)
    while (fileOffset < end) {
      // buffer at least the 3-byte magic + FLG before testing — a single
      // refill can legally return short (FSDataInputStream.read contract),
      // and comparing bytes past bufLen would judge the candidate on stale
      // data, skipping a genuine member during resync
      var more = true
      while (more && bufLen - bufPos < 4) more = refill()
      if (bufLen - bufPos < 3) return -1L // EOF inside the magic itself
      val i = bufPos
      val flagsOk = i + 3 >= bufLen || (buf(i + 3) & 0xE0) == 0
      if ((buf(i) & 0xFF) == 0x1F && (buf(i + 1) & 0xFF) == 0x8B &&
          buf(i + 2) == 8 && flagsOk) {
        val cand = fileOffset
        if (readMember(cand).exists(isWarc)) return cand
        seekTo(cand + 1)
      } else bufPos += 1
    }
    -1L
  }

  /** Decompress ONE gzip member starting at `offset`: manual header
    * parse (magic, CM=8, FLG with reserved bits clear, optional
    * FEXTRA/FNAME/FCOMMENT/FHCRC fields), raw-deflate inflate, and the
    * 8-byte CRC32+ISIZE trailer verified against the produced bytes.
    * None when anything is inconsistent — the validation that makes
    * resynchronization safe. On success the cursor rests exactly after
    * the member (its length is `fileOffset - offset`), so consecutive
    * members stream with no seeks at all.
    */
  private def readMember(offset: Long): Option[Array[Byte]] = {
    if (offset + 18 > fileLen) return None // header + trailer minimum
    seekTo(offset)
    val hdr = new Array[Byte](10)
    if (!readBytes(hdr, 10)) return None
    if ((hdr(0) & 0xFF) != 0x1F || (hdr(1) & 0xFF) != 0x8B || hdr(2) != 8)
      return None
    val flg = hdr(3) & 0xFF
    if ((flg & 0xE0) != 0) return None
    if ((flg & 0x04) != 0) { // FEXTRA
      val a = readByte(); val b = readByte()
      if (a < 0 || b < 0) return None
      if (!skipBytes(a | (b << 8))) return None
    }
    if ((flg & 0x08) != 0 && !skipZeroTerminated()) return None // FNAME
    if ((flg & 0x10) != 0 && !skipZeroTerminated()) return None // FCOMMENT
    if ((flg & 0x02) != 0 && !skipBytes(2)) return None // FHCRC
    inf.reset()
    val out = new java.io.ByteArrayOutputStream(1 << 12)
    val crc = new java.util.zip.CRC32()
    while (!inf.finished()) {
      if (inf.needsInput()) {
        if (bufPos >= bufLen && !refill()) return None // truncated member
        inf.setInput(buf, bufPos, bufLen - bufPos)
      }
      val m =
        try inf.inflate(outBuf)
        catch { case _: java.util.zip.DataFormatException => return None }
      if (m > 0) { out.write(outBuf, 0, m); crc.update(outBuf, 0, m) }
      else if (inf.needsDictionary()) return None
      if (!inf.finished() && inf.needsInput()) bufPos = bufLen
    }
    // finished: the last setInput window was (old bufPos .. bufLen);
    // whatever the inflater did not consume is still ahead of the cursor
    bufPos = bufLen - inf.getRemaining
    val tr = new Array[Byte](8)
    if (!readBytes(tr, 8)) return None
    if ((crc.getValue & 0xFFFFFFFFL) != le32(tr, 0)) return None
    if ((out.size().toLong & 0xFFFFFFFFL) != le32(tr, 4)) return None
    Some(out.toByteArray)
  }

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Skip a zero-terminated header field; false on EOF or unreasonable
    * length.
    */
  private def skipZeroTerminated(): Boolean = {
    var n = 0
    while (n < (1 << 16)) {
      val b = readByte()
      if (b < 0) return false
      if (b == 0) return true
      n += 1
    }
    false
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (math.max(pos, start) - start).toFloat / (end - start))
  override def close(): Unit = {
    inf.end()
    if (in != null) in.close()
  }
}
