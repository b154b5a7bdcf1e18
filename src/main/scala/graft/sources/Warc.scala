package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayOutputStream
import java.net.URI
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC source/sink — the Common-Crawl container format, so the engine
  * can ingest the crawl's native artifacts directly instead of requiring
  * a pre-converted parquet table.
  *
  * Read path: `binaryFile` scan → typed flatMap parse → Page-shaped rows
  * (url, warc_ts, html, lang, http_status, mime). One WARC chunk file =
  * one task (binaryFile does not split), which matches how Common Crawl
  * shards its corpus into ~1 GB `*.warc.gz` chunk files — parallelism
  * comes from the file count, exactly as on the real corpus. The parser
  * is TOLERANT (the E1 contract): junk between records, truncated tails,
  * unknown record types and malformed HTTP blocks are skipped, never
  * thrown.
  *
  * Write path: hash-partitioned `foreachPartition` streaming writer over
  * the Hadoop FileSystem API (works on file:// here, hdfs:///s3a:// on a
  * cluster), one `part-NNNNN.warc[.gz]` per task, records sorted by url
  * inside a file so output bytes are deterministic. Gzip mode writes one
  * gzip MEMBER per record — the actual Common Crawl layout (readers can
  * seek to a record offset and inflate a single member).
  *
  * The reference consumes payloads one keyed blob at a time
  * (/root/reference/src/s3_client.py:26-59); a crawl-scale corpus stores
  * those blobs embedded in WARC chunks — this operator is the bulk form
  * of that fetch seam, carrying the same (key → bytes) contract per
  * record with ids (urls) threaded through.
  */
object Warc {

  private val CRLF = "\r\n"

  /** language header real Common-Crawl responses carry (since CC-MAIN-2018-39) */
  private val LangHeader = "WARC-Identified-Content-Language"

  // ---------------------------------------------------------------- write

  /** Serialize one response record (headers ASCII, body raw bytes). */
  private[sources] def recordBytes(url: String, tsMs: Long, lang: String,
                                   html: Array[Byte]): Array[Byte] = {
    val http = new ByteArrayOutputStream(html.length + 128)
    val httpHead = new StringBuilder(128)
      .append("HTTP/1.1 200 OK").append(CRLF)
      .append("Content-Type: text/html; charset=UTF-8").append(CRLF)
      .append("Content-Length: ").append(html.length).append(CRLF)
      .append(CRLF)
    http.write(httpHead.toString.getBytes(StandardCharsets.US_ASCII))
    http.write(html)
    val httpBytes = http.toByteArray

    val head = new StringBuilder(256)
      .append("WARC/1.0").append(CRLF)
      .append("WARC-Type: response").append(CRLF)
      .append("WARC-Target-URI: ").append(url).append(CRLF)
      .append("WARC-Date: ").append(Instant.ofEpochMilli(tsMs).toString).append(CRLF)
      // deterministic record id (the spec requires one; no wall clock/UUID)
      .append("WARC-Record-ID: <urn:graft:").append(md5Hex(url)).append(">").append(CRLF)
      .append(LangHeader).append(": ").append(lang).append(CRLF)
      .append("Content-Type: application/http; msgtype=response").append(CRLF)
      .append("Content-Length: ").append(httpBytes.length).append(CRLF)
      .append(CRLF)
    val out = new ByteArrayOutputStream(httpBytes.length + 256)
    out.write(head.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(httpBytes)
    out.write(CRLF.getBytes(StandardCharsets.US_ASCII))
    out.write(CRLF.getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  /** Write `pages` (url, warc_ts, html, lang) as `numFiles` WARC chunk
    * files under `dir` (plus `_SUCCESS`). Null-html rows are dropped — a
    * fetch that returned nothing produces no response record, exactly as
    * on the real crawl. Deterministic: hash partitioning on url + in-file
    * url sort, no timestamps or randomness in the bytes.
    */
  def write(spark: SparkSession, pages: DataFrame, dir: String,
            numFiles: Int = 8, gzip: Boolean = true): Unit = {
    import spark.implicits._
    val ext = if (gzip) ".warc.gz" else ".warc"
    pages
      .select(col("url"), col("warc_ts").cast("timestamp"), col("html"),
        coalesce(col("lang"), lit("")).as("lang"))
      .where(col("html").isNotNull)
      .repartition(numFiles, pmod(xxhash64(col("url")), lit(numFiles.toLong)))
      .sortWithinPartitions(col("url"))
      .as[(String, java.sql.Timestamp, Array[Byte], String)]
      .foreachPartition { (it: Iterator[(String, java.sql.Timestamp, Array[Byte], String)]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conf = new org.apache.hadoop.conf.Configuration()
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d$ext")
        val fs = path.getFileSystem(conf)
        val os = fs.create(path, true)
        try it.foreach { case (url, ts, html, lang) =>
          val rec = recordBytes(url, ts.getTime, lang, html)
          if (gzip) {
            val g = new GZIPOutputStream(os, 64 * 1024)
            g.write(rec)
            g.finish() // one gzip member per record; do NOT close (os stays open)
          } else os.write(rec)
        } finally os.close()
      }
    val conf = new org.apache.hadoop.conf.Configuration()
    val succ = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    succ.getFileSystem(conf).create(succ, true).close()
  }

  // ----------------------------------------------------------------- read

  final case class WarcDoc(url: String, warc_ts: java.sql.Timestamp,
                           html: Array[Byte], lang: String,
                           http_status: Int, mime: String)

  /** Parse every response record in one WARC chunk (already gunzipped if
    * it was a .gz). Tolerant: skips junk, truncated tails, non-response
    * records, and malformed headers; NEVER throws.
    */
  private[sources] def parseChunk(bytes: Array[Byte]): Iterator[WarcDoc] = {
    if (bytes == null) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcDoc]
    val n = bytes.length
    var i = indexOfAscii(bytes, "WARC/", 0)
    while (i >= 0 && i < n) {
      val next =
        try parseRecord(bytes, i, out)
        catch { case _: Exception => -1 } // malformed → rescan below
      i =
        if (next > i) indexOfAscii(bytes, "WARC/", next)
        else indexOfAscii(bytes, "WARC/", i + 5) // skip the bad marker
    }
    out.iterator
  }

  /** Parse one record at `start` (bytes[start..] begins "WARC/"); append
    * to `out` if it is a well-formed response; return the offset just
    * past the record body, or -1 when framing is unrecoverable here.
    */
  private def parseRecord(bytes: Array[Byte], start: Int,
                          out: scala.collection.mutable.ArrayBuffer[WarcDoc]): Int = {
    val n = bytes.length
    val headerEnd = indexOfAscii(bytes, "\r\n\r\n", start)
    if (headerEnd < 0) return -1
    val headerText = new String(bytes, start, headerEnd - start, StandardCharsets.UTF_8)
    val headers = parseHeaders(headerText)
    val len = headers.get("content-length").flatMap(v => v.toLongOption).getOrElse(-1L)
    if (len < 0) return -1
    val bodyStart = headerEnd + 4
    val bodyEnd = math.min(bodyStart + len, n.toLong).toInt // truncation-tolerant
    val isResponse = headers.get("warc-type").contains("response") &&
      headers.get("content-type").exists(_.startsWith("application/http"))
    if (isResponse && bodyEnd > bodyStart) {
      val url = headers.getOrElse("warc-target-uri", "")
      val ts = headers.get("warc-date").flatMap { d =>
        try Some(new java.sql.Timestamp(Instant.parse(d).toEpochMilli))
        catch { case _: Exception => None }
      }.getOrElse(new java.sql.Timestamp(0L))
      val lang = headers.getOrElse(LangHeader.toLowerCase, "")
      parseHttp(bytes, bodyStart, bodyEnd).foreach { case (status, mime, html) =>
        if (url.nonEmpty) out += WarcDoc(url, ts, html, lang, status, mime)
      }
    }
    bodyEnd
  }

  /** HTTP response block → (status, mime, body bytes); None if malformed. */
  private def parseHttp(bytes: Array[Byte], start: Int, end: Int): Option[(Int, String, Array[Byte])] = {
    val headEnd = indexOfAscii(bytes, "\r\n\r\n", start)
    if (headEnd < 0 || headEnd >= end) return None
    val head = new String(bytes, start, headEnd - start, StandardCharsets.UTF_8)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
    val status = lines(0).split(" ") match {
      case parts if parts.length >= 2 => parts(1).toIntOption.getOrElse(0)
      case _ => 0
    }
    val hs = parseHeaders(head) // parseHeaders skips the status line itself
    val mime = hs.getOrElse("content-type", "").split(";")(0).trim
    val bodyStart = headEnd + 4
    // honor HTTP Content-Length when present and sane; else take the rest
    val bodyEnd = hs.get("content-length").flatMap(_.toLongOption) match {
      case Some(l) if l >= 0 && bodyStart + l <= end => (bodyStart + l).toInt
      case _ => end
    }
    Some((status, mime, java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd)))
  }

  /** case-insensitive name → value over a header block whose FIRST line
    * is the version/status line (skipped); malformed lines ignored
    */
  private def parseHeaders(text: String): Map[String, String] =
    text.split("\r\n", -1).iterator.drop(1).flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
    }.toMap

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def indexOfAscii(bytes: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(StandardCharsets.US_ASCII)
    val n = bytes.length - nb.length
    var i = math.max(from, 0)
    while (i <= n) {
      var k = 0
      while (k < nb.length && bytes(i + k) == nb(k)) k += 1
      if (k == nb.length) return i
      i += 1
    }
    -1
  }

  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // multi-member stream (one member per record): GZIPInputStream
    // consumes members back-to-back
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var r = in.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    out.toByteArray
  }

  /** Read every `*.warc` / `*.warc.gz` chunk under `dir` into the
    * Page-shaped table (url, warc_ts, html, lang, http_status, mime).
    * Undecodable chunk files contribute zero rows (tolerance, not tasks
    * failing) — per-record errors are already absorbed by the parser.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val raw =
          if (path.endsWith(".gz"))
            try gunzipAll(content)
            catch { case _: Exception => Array.empty[Byte] }
          else content
        parseChunk(raw)
      }
      .toDF()
  }
}
