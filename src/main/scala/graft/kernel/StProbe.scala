package graft.kernel

/** Micro-probe for kernel stage throughput: parse or structuredText in a
  * tight single-thread loop (used with jstack sampling to find hot spots —
  * BENCH.md §4a). Usage:
  *   runMain graft.kernel.StProbe <file.html> [parse|text] [iters]
  */
object StProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/tagdense.html"
    val mode = if (args.length > 1) args(1) else "text"
    val iters = if (args.length > 2) args(2).toInt else 50000
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    var sink = 0L
    var i = 0
    val warm = math.max(1000, iters / 5)
    def once(): Long = mode match {
      case "parse" => HtmlParser.parse(html).childNodes.length.toLong
      case _ => HtmlParser.parse(html).structuredText.length.toLong
    }
    while (i < warm) { sink += once(); i += 1 }
    val t0 = System.nanoTime()
    i = 0
    while (i < iters) { sink += once(); i += 1 }
    val s = (System.nanoTime() - t0) / 1e9
    println(f"$mode x$iters: $s%.2f s  ${iters / s}%.0f docs/s  sink=$sink")
  }
}
