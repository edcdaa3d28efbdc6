package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.kernel.HtmlParser
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parse the reference's real-world corpus through the full Spark path and
  * emit per-file structural fingerprints. No SQL oracle exists (DuckDB can't
  * parse HTML); determinism of these values is pinned by ScalaTest.
  */
object CorpusGolden {

  final case class Golden(name: String, valid: Boolean, n_nodes: Long,
      text_md5: String, outer_md5: String)

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  def run(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = Paths.get("/root/reference/test/html")
    val files: Seq[(String, Array[Byte])] =
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val stream = Files.list(dir)
        try
          stream.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
            .map(p => p.getFileName.toString -> Files.readAllBytes(p))
        finally stream.close()
      }
    spark.createDataset(files).repartition(math.max(1, files.size))
      .map { case (name, bytes) =>
        val html = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val root = HtmlParser.parse(html)
        var nodes = 0L
        val stack = new scala.collection.mutable.ArrayBuffer[graft.kernel.DomNode](64)
        root.childNodes.foreach(stack += _)
        while (stack.nonEmpty) {
          nodes += 1
          stack.remove(stack.length - 1) match {
            case e: graft.kernel.Element => e.childNodes.foreach(stack += _)
            case _ =>
          }
        }
        Golden(name, root.valid, nodes, md5hex(root.structuredText), md5hex(root.toHtml))
      }
      .toDF()
  }
}
