package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object D2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = jobs.get(j.jobId)
        if (t0 != 0) println(f"  job ${j.jobId}: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    })
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d2_ngram_pairs")(spark, "/root/testdata/sf0.1")
        .queryExecution.toRdd.count()
      println(f"d2 run $i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
