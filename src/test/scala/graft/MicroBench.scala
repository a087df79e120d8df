package graft
/** Engine-only microbench runner (test scope): prints per-tier MB/s. */
object MicroBench {
  def main(args: Array[String]): Unit =
    Bench.microbench().foreach(println)
}
