package graft.tools
import graft.functions.TextExtract
object ParsePerf {
  def main(args: Array[String]): Unit = {
    val base = """word1 word2 <span class="surl-text">#topic#</span> said <a href="/n/user7">@user7</a> more text here <b>bold</b> tail<br>"""
    Seq(1, 10, 50, 100, 250).foreach { rep =>
      val html = base * rep + """<a href="https://h1.example.test/u/1/p/2">更多</a>"""
      // warmup
      (1 to 2000).foreach(_ => TextExtract.extractText(html))
      val n = 5000
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => TextExtract.extractText(html))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"bytes=${html.length}%7d  per-doc=${dt / n * 1e6}%8.1f us  docs/s/core=${n / dt}%9.0f")
    }
  }
}
