package graft.kernel
import java.util.concurrent.atomic.LongAdder
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val seconds = if (args.length > 1) args(1).toInt else 8
    val html = """<div id="main" class="content"><p>the quick brown fox jumps over the lazy dog and keeps typing words until this looks like a paragraph of roughly realistic length for a synthetic document</p><ul><li class="item">en</li><li class="item">en</li><li class="item">en</li></ul><a href="https://example.com/42" lang="en">link</a></div>"""
    val sink = new LongAdder
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    // warmup
    (1 to 20000).foreach(_ => sink.add(HtmlParser.parse(html).structuredText.length))
    val counts = new LongAdder
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => {
        while (!done.get()) {
          sink.add(HtmlParser.parse(html).structuredText.length.toLong)
          counts.increment()
        }
      })
      t.start(); t
    }
    Thread.sleep(seconds * 1000L)
    done.set(true)
    ts.foreach(_.join())
    val n = counts.sum()
    println(f"threads=$threads docs=$n in ${seconds}s = ${n.toDouble/seconds}%.0f docs/s (${n.toDouble/seconds/threads}%.0f per thread) sink=${sink.sum()%1000}")
  }
}
