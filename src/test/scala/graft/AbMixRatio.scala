package graft

import graft.rewrite.{ElementHandlers, Rewriter}

/** Pinned A/B helper for the sel_mix-vs-lex gap: interleaved timed passes
  * of the full-lex tier and the 3-selector mix (div / .note / [href]) in
  * one JVM; reports each tier's best pass and the ratio (same rationale
  * as [[AbRawRatio]] — the ratio survives host noise the absolutes don't).
  *
  * Usage: Test/runMain graft.AbMixRatio [doc] [passes]  (pin with taskset)
  */
object AbMixRatio {
  def main(args: Array[String]): Unit = {
    val doc = if (args.length > 0) args(0) else "cloudflare.com.html"
    val passes = if (args.length > 1) args(1).toInt else 8
    val in = getClass.getResourceAsStream(s"/benchdocs/$doc")
    val bytes = in.readAllBytes(); in.close()
    val reps = math.max(8, 48 * 1024 * 1024 / bytes.length)

    val lexer = new graft.core.Lexer(strict = false)
    val nullSink = new graft.core.LexemeSink {
      var tags = 0
      def onText(s: Int, e: Int, t: Int): Unit = ()
      def onStartTag(ns: Int, ne: Int, h: Long, n: Int, sc: Boolean,
                     a: graft.core.AttrList, rs: Int, re: Int): Unit = tags += 1
      def onEndTag(ns: Int, ne: Int, h: Long, rs: Int, re: Int): Unit = tags += 1
      def onComment(ts: Int, te: Int, rs: Int, re: Int): Unit = ()
      def onDoctype(a: Int, b: Int, c: Boolean, d: Int, e: Int, f: Boolean,
                    g: Int, h: Int, i: Boolean, j: Boolean, k: Int, l: Int): Unit = ()
      def onRawWithoutToken(rs: Int, re: Int): Unit = ()
      def onEof(p: Int): Unit = ()
    }
    var n = 0
    val ch = ElementHandlers(element = _ => n += 1)
    val rwMix = new Rewriter(Seq("div" -> ch, ".note" -> ch, "[href]" -> ch),
      strict = false, produceOutput = false)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      (System.nanoTime() - t0) / 1e9
    }
    var w = 0
    while (w < 2) {
      timed(lexer.parse(bytes, nullSink))
      timed(rwMix.rewriteToBytes(bytes))
      w += 1
    }
    var bestLex = Double.MaxValue
    var bestMix = Double.MaxValue
    val perPass = new Array[Double](passes)
    var p = 0
    while (p < passes) {
      val tl = timed(lexer.parse(bytes, nullSink))
      val tm = timed(rwMix.rewriteToBytes(bytes))
      if (tl < bestLex) bestLex = tl
      if (tm < bestMix) bestMix = tm
      perPass(p) = tl / tm
      p += 1
    }
    val mb = bytes.length.toDouble * reps / 1e6
    // the best-of-each-side ratio pairs times from DIFFERENT noise
    // moments; the median of per-pass ratios (lex and mix timed
    // back-to-back within one pass) is the contention-robust readout
    java.util.Arrays.sort(perPass)
    val med = perPass(passes / 2)
    println(f"$doc lex=${mb / bestLex}%.1f MB/s sel_mix=${mb / bestMix}%.1f MB/s " +
      f"ratio=${bestLex / bestMix}%.3f median_pass_ratio=$med%.3f")
  }
}
