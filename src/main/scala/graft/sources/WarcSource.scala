package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Page
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.GZIPInputStream

/** WARC ingestion: Common-Crawl-shaped crawl archives → the canonical
  * `Page` table (url, warc_ts, html BINARY, text, lang), ready for
  * ExtractJob. Self-contained parser for WARC/1.0/1.1 as written by crawl
  * tooling:
  *
  *   - a file is a sequence of records: `WARC/1.x\r\n` + name:value headers
  *     + `\r\n` + Content-Length block bytes + `\r\n\r\n`
  *   - only `WARC-Type: response` (and `resource`) records yield pages; the
  *     HTTP envelope inside a response block is stripped (body starts after
  *     the first `\r\n\r\n`)
  *   - gzip is detected per file and handled for BOTH layouts in the wild:
  *     one gzip member per record (Common Crawl) and whole-file gzip —
  *     JDK GZIPInputStream consumes concatenated members natively
  *
  * Scale shape: `binaryFile` scan → one task per WARC file (the natural
  * granule — CC shards are ~1 GB, sized for exactly this) → per-partition
  * record split → Page rows. Map-only; composes with ExtractJob's optional
  * salted repartition for host skew. `text`/`lang` are null at ingest
  * (they're downstream products), matching the input_hint schema.
  */
object WarcSource {

  /** Read every record in (possibly multi-member-gzipped) WARC bytes. */
  private[sources] def parseWarc(raw: Array[Byte]): Iterator[Page] = {
    val data =
      if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
        gunzipAll(raw)
      else raw
    new Iterator[Page] {
      private var pos = 0
      private var nextPage: Page = advance()
      private def advance(): Page = {
        while (pos < data.length) {
          val rec = parseRecord(data, pos)
          if (rec == null) {
            // malformed record (bad Content-Length, oversized header, junk):
            // RESYNC at the next "WARC/" magic instead of silently dropping
            // the rest of a 1 GB shard — one corrupt record costs one record
            val resync = indexOfBytes(data, "\r\nWARC/", pos + 1, data.length)
            if (resync < 0) { pos = data.length; return null }
            pos = resync + 2
          } else {
            pos = rec.next
            if (rec.page != null) return rec.page
          }
        }
        null
      }
      def hasNext: Boolean = nextPage != null
      def next(): Page = { val p = nextPage; nextPage = advance(); p }
    }
  }

  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(raw), 1 << 16)
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private final class Rec(val page: Page, val next: Int)

  private def indexOfBytes(data: Array[Byte], target: String, from: Int, limit: Int): Int = {
    val t = target.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = from
    val max = math.min(limit, data.length) - t.length
    while (i <= max) {
      var j = 0
      while (j < t.length && data(i + j) == t(j)) j += 1
      if (j == t.length) return i
      i += 1
    }
    -1
  }

  /** Parse one record at `start`; null when no well-formed record remains. */
  private def parseRecord(data: Array[Byte], start0: Int): Rec = {
    var start = start0
    // skip inter-record CRLFs
    while (start < data.length &&
      (data(start) == '\r' || data(start) == '\n')) start += 1
    if (start >= data.length) return null
    val headerEnd = indexOfBytes(data, "\r\n\r\n", start, math.min(data.length, start + 65536))
    if (headerEnd < 0) return null
    val header = new String(data, start, headerEnd - start,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!header.startsWith("WARC/")) return null
    var warcType = ""
    var uri = ""
    var date = ""
    var contentLength = -1L
    header.split("\r\n").iterator.drop(1).foreach { line =>
      val c = line.indexOf(':')
      if (c > 0) {
        val k = line.substring(0, c).trim.toLowerCase
        val v = line.substring(c + 1).trim
        k match {
          case "warc-type" => warcType = v.toLowerCase
          case "warc-target-uri" => uri = v.stripPrefix("<").stripSuffix(">")
          case "warc-date" => date = v
          case "content-length" =>
            contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
          case _ =>
        }
      }
    }
    if (contentLength < 0) return null
    val blockStart = headerEnd + 4
    val blockEnd = math.min(data.length.toLong, blockStart + contentLength).toInt
    val page =
      if ((warcType == "response" || warcType == "resource") && uri.nonEmpty) {
        // response blocks carry an HTTP envelope; resource blocks are bare
        var bodyStart = blockStart
        if (indexOfBytes(data, "HTTP/", blockStart, blockStart + 5) == blockStart) {
          val he = indexOfBytes(data, "\r\n\r\n", blockStart, blockEnd)
          bodyStart = if (he >= 0) he + 4 else blockEnd
        }
        val body = java.util.Arrays.copyOfRange(data, bodyStart, blockEnd)
        Page(uri, parseWarcDate(date), body, null, null)
      } else null
    new Rec(page, blockEnd)
  }

  private[sources] def parseWarcDate(s: String): java.sql.Timestamp =
    try java.sql.Timestamp.from(java.time.Instant.parse(s))
    catch { case _: Exception => new java.sql.Timestamp(0L) }

  /** WARC files under `path` → Page dataset (one task per file). */
  def read(spark: SparkSession, path: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseWarc))
  }

  /** Convenience: straight to the extraction pipeline. */
  def extract(spark: SparkSession, path: String,
      saltPartitions: Int = 0): DataFrame =
    graft.pipeline.ExtractJob.run(read(spark, path).toDF(), saltPartitions).toDF()
}
