package graft
import graft.extract.{ExtractPolicy, Extractor}
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val in = getClass.getResourceAsStream("/benchdocs/cloudflare.com.html")
    val bytes = in.readAllBytes(); in.close()
    def run(threads: Int, reps: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (1 to threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val ex = new Extractor(ExtractPolicy.Default.copy(strict = false))
            var i = 0
            while (i < reps) { ex.extractHtml(bytes, Vector.empty, Vector.empty); i += 1 }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val secs = (System.nanoTime() - t0) / 1e9
      bytes.length.toDouble * reps * threads / secs / 1e6
    }
    run(4, 100) // warmup
    run(32, 100)
    for (t <- Seq(1, 8, 32)) {
      val mb = (1 to 3).map(_ => run(t, 300)).max
      println(f"threads=$t%2d  total=${mb}%8.1f MB/s  per-thread=${mb / t}%7.1f MB/s")
    }
  }
}
