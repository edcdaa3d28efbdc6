package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream
import java.nio.file.Files

class WarcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .appName("warc-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def record(warcType: String, uri: String, date: String,
      block: Array[Byte]): Array[Byte] = {
    val uriLine = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    val header = s"WARC/1.0\r\nWARC-Type: $warcType\r\n$uriLine" +
      s"WARC-Date: $date\r\nWARC-Record-ID: <urn:test:$warcType>\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(header.getBytes("ISO-8859-1"))
    out.write(block)
    out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    out.toByteArray
  }

  private def httpResponse(body: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" + body)
      .getBytes("UTF-8")

  private val html1 = "<html><body><p>First page</p></body></html>"
  private val html2 = "<div><p>Zwei &amp; zwei</p></div>"
  private val html3 = "<p>bare resource</p>"

  private def records: Seq[Array[Byte]] = Seq(
    record("warcinfo", null, "2024-03-01T00:00:00Z",
      "software: graft-test\r\n".getBytes("UTF-8")),
    record("request", "https://a.example/one", "2024-03-01T10:00:00Z",
      "GET /one HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes("UTF-8")),
    record("response", "https://a.example/one", "2024-03-01T10:00:01Z",
      httpResponse(html1)),
    record("response", "https://b.example/two", "2024-03-01T11:30:00Z",
      httpResponse(html2)),
    record("resource", "https://c.example/three", "2024-03-01T12:00:00Z",
      html3.getBytes("UTF-8")))

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }

  private def writeCorpus(): String = {
    val dir = Files.createTempDirectory("warc_spec").toFile
    // plain concatenated records
    val plain = new FileOutputStream(new java.io.File(dir, "plain.warc"))
    records.foreach(plain.write); plain.close()
    // Common Crawl layout: one gzip member per record
    val members = new FileOutputStream(new java.io.File(dir, "members.warc.gz"))
    records.foreach(r => members.write(gzipMember(r))); members.close()
    // whole-file gzip
    val whole = new ByteArrayOutputStream()
    records.foreach(whole.write)
    val wf = new FileOutputStream(new java.io.File(dir, "whole.warc.gz"))
    wf.write(gzipMember(whole.toByteArray)); wf.close()
    dir.getAbsolutePath
  }

  test("WARC records parse to Pages across plain / member-gzip / whole-gzip") {
    val dir = writeCorpus()
    val pages = WarcSource.read(spark, dir).collect()
    // 3 page-bearing records per file × 3 files
    assert(pages.length == 9)
    val byUrl = pages.groupBy(_.url)
    assert(byUrl.keySet == Set("https://a.example/one", "https://b.example/two",
      "https://c.example/three"))
    byUrl.values.foreach(v => assert(v.length == 3)) // identical in all layouts
    val one = byUrl("https://a.example/one").head
    assert(new String(one.html, "UTF-8") == html1) // HTTP envelope stripped
    assert(one.warc_ts == java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-01T10:00:01Z")))
    val three = byUrl("https://c.example/three").head
    assert(new String(three.html, "UTF-8") == html3) // resource: bare block
    assert(one.text == null && one.lang == null)
  }

  test("WARC pages flow through the extraction pipeline") {
    val dir = writeCorpus()
    val parsed = WarcSource.extract(spark, dir)
      .select("url", "parse_ok", "text_out").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(parsed.length == 9)
    assert(parsed.forall(_._2)) // all well-formed
    assert(parsed.find(_._1 == "https://a.example/one").get._3 == "First page")
    assert(parsed.find(_._1 == "https://b.example/two").get._3 == "Zwei & zwei")
  }

  test("malformed tails and truncated records do not derail parsing") {
    val junk = "WARC/1.0\r\nContent-Length: oops\r\n\r\n".getBytes("UTF-8") // bad length
    val truncated = records.head.take(20)
    val bytes = records(2) ++ junk ++ truncated
    val pages = WarcSource.parseWarc(bytes).toList
    assert(pages.length == 1 && pages.head.url == "https://a.example/one")
  }

  test("seeded byte-mutation fuzz: parser always terminates, never throws") {
    val rng = new scala.util.Random(20260816L)
    val base = {
      val out = new ByteArrayOutputStream()
      records.foreach(out.write)
      out.toByteArray
    }
    (1 to 200).foreach { _ =>
      val mutated = base.clone()
      (1 to rng.nextInt(8) + 1).foreach { _ =>
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
      }
      // must terminate and yield only well-formed pages — count is free to
      // vary (mutations can corrupt framing), crashing or hanging is not
      val pages = WarcSource.parseWarc(mutated).toList
      assert(pages.size <= 4)
      pages.foreach(p => assert(p.url != null && p.html != null))
    }
  }

  test("WARC sink round-trips through the streaming reader") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc_sink").toString + "/out"
    val pages = Seq(
      graft.pipeline.Page("https://s.example/1",
        java.sql.Timestamp.from(java.time.Instant.parse("2024-05-01T08:00:00Z")),
        "<div><p>alpha &amp; beta</p></div>".getBytes("UTF-8"), null, null),
      graft.pipeline.Page("https://s.example/2",
        java.sql.Timestamp.from(java.time.Instant.parse("2024-05-01T09:30:00Z")),
        "<ul><li>eins</li><li>zwei</li></ul>".getBytes("UTF-8"), null, null))
    WarcSource.write(pages.toDF().repartition(2), dir)
    val back = WarcSource.read(spark, dir).collect().sortBy(_.url)
    assert(back.length == 2)
    assert(back.map(_.url).toSeq == Seq("https://s.example/1", "https://s.example/2"))
    // byte-identical bodies (HTTP envelope added by the writer, stripped by
    // the reader) and exact timestamps
    assert(new String(back(0).html, "UTF-8") == "<div><p>alpha &amp; beta</p></div>")
    assert(new String(back(1).html, "UTF-8") == "<ul><li>eins</li><li>zwei</li></ul>")
    assert(back(0).warc_ts == pages(0).warc_ts && back(1).warc_ts == pages(1).warc_ts)
    // overwrite semantics: a second write replaces, never appends
    WarcSource.write(pages.take(1).toDF(), dir)
    assert(WarcSource.read(spark, dir).count() == 1)
  }

  test("streaming parser never materializes the shard (bounded by record size)") {
    // a full CC shard would OOM if the parser buffered the decompressed
    // stream (round-2 design); prove the parser consumes an InputStream
    // incrementally — reading the FIRST page must not consume a 200-repeat
    // (~250 KB ≫ the 64 KB read buffer) tail
    val out = new ByteArrayOutputStream()
    (1 to 200).foreach(_ => records.foreach(out.write))
    val bytes = out.toByteArray
    assert(bytes.length > (1 << 17))
    var maxRead = 0
    val counting = new java.io.InputStream {
      private var pos = 0
      def read(): Int = {
        if (pos >= bytes.length) -1
        else { val b = bytes(pos) & 0xFF; pos += 1; maxRead = pos; b }
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (pos >= bytes.length) return -1
        val n = math.min(len, bytes.length - pos)
        System.arraycopy(bytes, pos, b, off, n)
        pos += n; maxRead = pos; n
      }
    }
    val it = WarcSource.parseStream(counting)
    assert(it.hasNext)
    val first = it.next()
    assert(first.url == "https://a.example/one")
    // the reader may buffer ahead (64 KB BufferedInputStream) but must not
    // have consumed the whole multi-record tail just to yield page one
    assert(maxRead <= 2 * (1 << 16), s"consumed $maxRead of ${bytes.length}")
    assert(it.size == 200 * 3 - 1) // every remaining page still parses
  }

  test("a corrupt record mid-file costs one record, not the rest of the shard") {
    val junk = "WARC/1.0\r\nContent-Length: oops\r\n\r\n".getBytes("UTF-8")
    val bytes = records(2) ++ junk ++ records(3)
    val pages = WarcSource.parseWarc(bytes).toList
    // resync at the next WARC/ magic recovers the record after the junk
    assert(pages.map(_.url) == List("https://a.example/one", "https://b.example/two"))
  }
}
