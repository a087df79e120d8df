package graft

import graft.rewrite.{ElementHandlers, Rewriter}

/** Pinned A/B for the per-tag attr-name bloom (round 5): interleaved
  * timed passes of the SAME sel_mix workload with the bloom guards on and
  * off in one JVM — host contention moves both sides together, so the
  * on/off ratio is trustworthy where absolutes are not (the same
  * rationale as [[AbMixRatio]]/[[AbRawRatio]]).
  *
  * Usage: Test/runMain graft.AbBloomRatio [doc] [passes]  (pin with taskset)
  */
object AbBloomRatio {
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
      graft.selectors.Instr.BloomGate = true; timed(rwMix.rewriteToBytes(bytes))
      graft.selectors.Instr.BloomGate = false; timed(rwMix.rewriteToBytes(bytes))
      w += 1
    }
    var bestOn = Double.MaxValue
    var bestOff = Double.MaxValue
    var p = 0
    while (p < passes) {
      graft.selectors.Instr.BloomGate = true
      val tOn = timed(rwMix.rewriteToBytes(bytes))
      graft.selectors.Instr.BloomGate = false
      val tOff = timed(rwMix.rewriteToBytes(bytes))
      if (tOn < bestOn) bestOn = tOn
      if (tOff < bestOff) bestOff = tOff
      p += 1
    }
    graft.selectors.Instr.BloomGate = true
    val mb = bytes.length.toDouble * reps / 1e6
    println(f"$doc bloom_on=${mb / bestOn}%.1f MB/s bloom_off=${mb / bestOff}%.1f MB/s on/off=${bestOff / bestOn}%.3f")
  }
}
