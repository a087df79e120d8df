package graft

/** Tail-window guarantee, shared by [[Bench]] and [[BenchEmitProbe]] (which
  * the driver-simulator spec runs through a real sbt child). Deliberately a
  * standalone Spark-free object: loading it must not trigger Spark/TypeTag
  * class initialization, so the probe can run on a bare scala-library
  * classpath.
  *
  * Contract: the caller stops Spark FIRST (its shutdown lines land before
  * this); we flush stderr, then emit a brace-free padding line wider than
  * the driver's 2,000-byte tail followed by the ONE JSON line — so the
  * captured tail can only ever contain padding + the headline JSON, and
  * (with build.sbt's StdoutOutput + showSuccess:=false) the JSON is the
  * LAST line of sbt's combined output, unprefixed.
  */
object BenchTail {
  def emitHeadline(json: String): Unit = {
    System.err.flush()
    try Thread.sleep(500) catch { case _: InterruptedException => () }
    println("=" * 2100)
    println(json)
    System.out.flush()
  }
}
