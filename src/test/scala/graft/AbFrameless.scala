package graft

import graft.rewrite.{ElementHandlers, Rewriter, RewriteListener}
import graft.extract.ExtractPolicy

/** Same-JVM A/B of the frameless VM vs the framed stack on the
  * extraction-shaped workload (strip handlers + raw-text listener, no
  * output). Alternates modes within one process so JIT/host noise hits
  * both sides equally.
  */
object AbFrameless {
  def main(args: Array[String]): Unit = {
    val doc = if (args.length > 0) args(0) else "ecma402-spec.html"
    val passes = if (args.length > 1) args(1).toInt else 8
    val bytes =
      if (doc == "small") {
        // corpus-shaped small doc (~3 KB): the per-document reset cost
        // dominates relatively more than on the 1 MB spec documents
        val sb = new StringBuilder("<html><head><meta charset=utf-8><title>t</title></head><body><nav><a href=/>home</a></nav>")
        var i = 0
        while (i < 30) {
          sb.append(s"<div class=c$i><p>paragraph $i with some text content here</p><span>inline</span></div>")
          i += 1
        }
        sb.append("<footer>f</footer></body></html>")
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      } else {
        val in = getClass.getResourceAsStream(s"/benchdocs/$doc")
        val b = in.readAllBytes(); in.close(); b
      }

    val listener = new RewriteListener {
      var n = 0
      override def wantsRawText: Boolean = true
      override def onRawText(s: Int, e: Int, t: Int): Unit = n += 1
    }
    def mkRw(framed: Boolean): Rewriter = {
      val rw = new Rewriter(
        ExtractPolicy.DefaultStrip.map(s => s -> ElementHandlers(element = el => el.remove())) :+
          ("meta" -> ElementHandlers(element = _ => ())),
        strict = false, listener = listener, produceOutput = false)
      if (framed) rw.disableFramelessVm()
      rw
    }
    val rwFl = mkRw(framed = false)
    val rwFr = mkRw(framed = true)
    val reps = math.max(8, 48 * 1024 * 1024 / bytes.length)

    def mbps(rw: Rewriter): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { rw.rewriteToBytes(bytes); i += 1 }
      bytes.length.toDouble * reps / ((System.nanoTime() - t0) / 1e9) / 1e6
    }
    // warmup both
    mbps(rwFl); mbps(rwFr); mbps(rwFl); mbps(rwFr)
    var bestFl = 0.0
    var bestFr = 0.0
    var p = 0
    while (p < passes) {
      bestFl = math.max(bestFl, mbps(rwFl))
      bestFr = math.max(bestFr, mbps(rwFr))
      p += 1
    }
    println(f"$doc%-24s frameless=$bestFl%8.1f MB/s  framed=$bestFr%8.1f MB/s  ratio=${bestFl / bestFr}%.3f")
  }
}
