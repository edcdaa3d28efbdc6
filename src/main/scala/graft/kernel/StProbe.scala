package graft.kernel
object StProbe {
  def main(args: Array[String]): Unit = {
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/tmp/tagdense.html")), "UTF-8")
    val root = HtmlParser.parse(html)
    var sink = 0L
    var i = 0
    while (i < 20000) { sink += root.structuredText.length; i += 1 } // warm
    val t0 = System.nanoTime()
    i = 0
    while (i < 50000) { sink += root.structuredText.length; i += 1 }
    val s = (System.nanoTime()-t0)/1e9
    println(f"structuredText x50000: $s%.2f s  ${50000/s}%.0f docs/s  sink=$sink")
  }
}
