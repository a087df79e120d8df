package graft

/** Driver-simulator stub: emits a headline JSON line through EXACTLY the
  * same path as [[Bench]] (stderr noise first, then Bench.emitHeadline),
  * but without starting Spark — so BenchTailParseSpec can spawn a real
  * `sbt -batch "runMain graft.BenchEmitProbe"` child in seconds, capture
  * the combined output, keep the final 2,000 bytes (the driver's window),
  * and require the last line to be the bare parseable JSON. BENCH_r03–r05
  * all recorded `parsed: null`; r05's killer was sbt itself (the logger's
  * "[info] " prefix on forked stdout + the trailing "[success]" banner),
  * which only an sbt-in-the-loop test can catch.
  */
object BenchEmitProbe {
  // stable probe line; the spec asserts byte-identical recovery from the tail
  val ProbeJson: String =
    """{"metric":"probe","value":1.234,"unit":"sec","queries":{"q1":0.10,"q2":0.20},"sf":"/tmp/none"}"""

  def main(args: Array[String]): Unit = {
    // simulate the pre-headline chatter the real bench produces
    System.err.println("[engine] probe stderr noise line 1")
    System.err.println("[scaling] probe stderr noise line 2")
    println("probe stdout noise line (must not be last)")
    BenchTail.emitHeadline(ProbeJson)
  }
}
