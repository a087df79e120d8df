package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.ops.DedupOps

/** ROUND-7 A/B harness: interleaved same-JVM comparison of d2/d2b fed
  * from inline postings (the pre-switch form, kept as *InlineAb) vs the
  * row-format localCheckpoint postings memo (the declared form since
  * this A/B read memo ~1.35 s vs inline ~1.65 s median with the inline
  * side's 4-5 s GC-burst spikes gone). Interleaving inside one JVM is
  * the contention-robust protocol from BASELINE.md; the memo is warmed
  * first (as the bench's alphabetical order does via d14/d17).
  */
object AbD2Postings {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ab-d2")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val base = DedupOps.withVariants(spark, sfDir)

    // warm: shingle cache + postings memo + one pass of each variant (JIT)
    spark.sparkContext.setJobDescription("ab:warm")
    DedupOps.shingleSkewAudit(base).queryExecution.toRdd.count()
    DedupOps.ngramJaccardPairsInlineAb(base, 0.6).queryExecution.toRdd.count()
    DedupOps.ngramJaccardPairs(base, 0.6).queryExecution.toRdd.count()
    DedupOps.ngramJaccardPairsCappedInlineAb(base, 0.6).queryExecution.toRdd.count()
    DedupOps.ngramJaccardPairsCapped(base, 0.6).queryExecution.toRdd.count()

    for (p <- 1 to passes) {
      spark.sparkContext.setJobDescription(s"ab:d2-inline p$p")
      val a = time(DedupOps.ngramJaccardPairsInlineAb(base, 0.6).queryExecution.toRdd.count())
      spark.sparkContext.setJobDescription(s"ab:d2-memo p$p")
      val b = time(DedupOps.ngramJaccardPairs(base, 0.6).queryExecution.toRdd.count())
      spark.sparkContext.setJobDescription(s"ab:d2b-inline p$p")
      val c = time(DedupOps.ngramJaccardPairsCappedInlineAb(base, 0.6).queryExecution.toRdd.count())
      spark.sparkContext.setJobDescription(s"ab:d2b-memo p$p")
      val d = time(DedupOps.ngramJaccardPairsCapped(base, 0.6).queryExecution.toRdd.count())
      println(f"AB pass=$p d2_inline=$a%6.2f d2_memo=$b%6.2f d2b_inline=$c%6.2f d2b_memo=$d%6.2f")
    }
    spark.stop()
  }
}
