package graft

import graft.rewrite.{ElementHandlers, Rewriter}

/** Pinned A/B for the class-token candidate scan (SWAR memchr vs plain
  * first-byte loop): interleaved timed passes of the SAME sel_mix
  * workload with `Rewriter.ClsProbeMemchr` toggled per pass in one JVM —
  * host contention moves both sides together, so the memchr/loop ratio
  * is trustworthy where absolutes are not.
  *
  * Usage: Test/runMain graft.AbClsRatio [doc] [passes]  (pin with taskset)
  */
object AbClsRatio {
  def main(args: Array[String]): Unit = {
    val doc = if (args.length > 0) args(0) else "cloudflare.com.html"
    val passes = if (args.length > 1) args(1).toInt else 10
    val in = getClass.getResourceAsStream(s"/benchdocs/$doc")
    val bytes = in.readAllBytes(); in.close()
    val reps = math.max(8, 48 * 1024 * 1024 / bytes.length)

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
    while (w < 2) { // warm both branch shapes
      Rewriter.ClsProbeMemchr = true; timed(rwMix.rewriteToBytes(bytes))
      Rewriter.ClsProbeMemchr = false; timed(rwMix.rewriteToBytes(bytes))
      w += 1
    }
    var bestM = Double.MaxValue
    var bestL = Double.MaxValue
    val perPass = new Array[Double](passes)
    var p = 0
    while (p < passes) {
      Rewriter.ClsProbeMemchr = true
      val tm = timed(rwMix.rewriteToBytes(bytes))
      Rewriter.ClsProbeMemchr = false
      val tl = timed(rwMix.rewriteToBytes(bytes))
      if (tm < bestM) bestM = tm
      if (tl < bestL) bestL = tl
      perPass(p) = tl / tm // >1 means memchr faster
      p += 1
    }
    Rewriter.ClsProbeMemchr = true
    java.util.Arrays.sort(perPass)
    val mb = bytes.length.toDouble * reps / 1e6
    println(f"$doc memchr=${mb / bestM}%.1f MB/s loop=${mb / bestL}%.1f MB/s " +
      f"memchr/loop=${bestL / bestM}%.3f median_pass=${perPass(passes / 2)}%.3f")
  }
}
