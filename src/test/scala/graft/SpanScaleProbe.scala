package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling probe for the d12/d13 span-dedup path
  * (round-5 verdict stretch ask): the newest shuffle-bearing operator
  * family — positional grams, one xxhash64 exchange, count-window by
  * gram, interval fold. Run it twice in FRESH taskset-pinned JVMs (the
  * only trustworthy protocol on this host, see CLAUDE.md):
  *
  *   taskset -c 8-9   sbt -batch "Test/runMain graft.SpanScaleProbe 2"
  *   taskset -c 8-15  sbt -batch "Test/runMain graft.SpanScaleProbe 8"
  *
  * and compute efficiency = (wall_2 / wall_8) / 4. Reports the min of
  * `runs` steady-state executions (first run is JIT/codegen warmup).
  *
  * The corpus is replicated `rep`x with shifted ids (the DedupScaleProbe
  * pattern): at rep 1 the sf0.1 job is ~1.5 s on 2 cores, so per-job
  * driver overhead (planning, scheduling) dominates and the pair
  * measures Amdahl, not the operator — rep 30 puts the 2-core wall near
  * a minute, where the shuffle path is the cost.
  *
  * Usage: Test/runMain graft.SpanScaleProbe <cores> [sfDir] [runs] [rep] [d13]
  */
object SpanScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 4
    val rep = if (args.length > 3) args(3).toInt else 1
    val alsoApply = args.length > 4 && args(4) == "d13"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.spark.ops.DedupOps
    import org.apache.spark.sql.functions._

    val base0 = DedupOps.withVariants(spark, sfDir)
    val base =
      if (rep <= 1) base0
      else spark.range(0, rep, 1, math.max(2, cores)).toDF("rep")
        .join(broadcast(base0))
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("text"))
    def job(): Long =
      if (alsoApply) DedupOps.spanDedupApply(base).queryExecution.toRdd.count()
      else DedupOps.spanDedup(base).queryExecution.toRdd.count()

    val times = Array.tabulate(runs) { _ =>
      val t0 = System.nanoTime()
      val rows = job()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val walls = times.map(_._1)
    println(f"[spanscale] cores=$cores sf=$sfDir rep=$rep d13=$alsoApply rows=${times.head._2} " +
      f"min=${walls.drop(1).min}%6.2f s runs=${walls.map(w => f"$w%.2f").mkString("[", ",", "]")}")
    spark.stop()
  }
}
