package graft

import graft.extract.{ExtractPolicy, Extractor}

/** Pinned A/B helper for the extract_raw-vs-lex gap: runs the two tiers
  * in INTERLEAVED timed passes inside one JVM and reports each tier's
  * best pass plus the ratio. Interleaving puts both tiers in the same
  * host-noise window, so the RATIO stays meaningful even when absolute
  * MB/s swings +-25% (see CLAUDE.md measurement-reality notes).
  *
  * Usage: Test/runMain graft.AbRawRatio [doc] [passes]  (pin with taskset)
  */
object AbRawRatio {
  def main(args: Array[String]): Unit = {
    val doc = if (args.length > 0) args(0) else "ecma402-spec.html"
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
    val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both paths
    var w = 0
    while (w < 2) {
      timed(lexer.parse(bytes, nullSink))
      timed(ex.extractRaw(bytes, Vector.empty, Vector.empty))
      w += 1
    }
    var bestLex = Double.MaxValue
    var bestRaw = Double.MaxValue
    var p = 0
    while (p < passes) {
      val tl = timed(lexer.parse(bytes, nullSink))
      val tr = timed(ex.extractRaw(bytes, Vector.empty, Vector.empty))
      if (tl < bestLex) bestLex = tl
      if (tr < bestRaw) bestRaw = tr
      p += 1
    }
    val mb = bytes.length.toDouble * reps / 1e6
    println(f"$doc lex=${mb / bestLex}%.1f MB/s extract_raw=${mb / bestRaw}%.1f MB/s ratio=${bestLex / bestRaw}%.3f")
  }
}
