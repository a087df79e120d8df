package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling probe for t21's order-statistic path (the
  * round-6 winsorization op): one exchange by source + per-source window
  * sort on a projection-only (source, n_chars, doc_id) pass, a tiny
  * stats table broadcast back, and the clip applied map-side. Protocol
  * (see CLAUDE.md — fresh pinned JVMs, quiet core regions):
  *
  *   taskset -c 8-9   sbt -batch "Test/runMain graft.WinsorizeScaleProbe 2"
  *   taskset -c 8-15  sbt -batch "Test/runMain graft.WinsorizeScaleProbe 8"
  *
  * efficiency = (wall_2 / wall_8) / 4, min of steady-state runs.
  *
  * Input is SYNTHETIC range arithmetic (the JoinScaleProbe lesson: a
  * broadcast-replicated generator alone pairs at ~0.82 from L3
  * contention and row-materialized consumers plateau at the box's
  * UnsafeRow bandwidth) — xxhash64-derived source/n_chars straight off
  * spark.range, consumed by an IN-STAGE aggregate so the pair measures
  * the exchange + window sort, not materialization.
  *
  * Usage: Test/runMain graft.WinsorizeScaleProbe <cores> [rows] [runs] [sources]
  */
object WinsorizeScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val n = if (args.length > 1) args(1).toLong else 30000000L
    val runs = if (args.length > 2) args(2).toInt else 4
    val sources = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.spark.ops.TextOps
    import org.apache.spark.sql.functions._

    val docs = spark.range(0L, n, 1L, math.max(2, cores)).toDF("id")
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(xxhash64(col("id")), lit(sources.toLong))).as("source"),
        pmod(xxhash64(col("id"), lit(7)), lit(100000L)).as("n_chars"))
    def job(): (Long, Long) = {
      val r = TextOps.winsorizeLengths(docs)
        .agg(sum("clipped_len"), sum(col("is_outlier").cast("long"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val times = Array.tabulate(runs) { _ =>
      val t0 = System.nanoTime()
      val out = job()
      ((System.nanoTime() - t0) / 1e9, out)
    }
    val walls = times.map(_._1)
    println(f"[winsorscale] cores=$cores rows=$n sources=$sources " +
      f"sumClip=${times.head._2._1} outliers=${times.head._2._2} " +
      f"min=${walls.drop(1).min}%6.2f s runs=${walls.map(w => f"$w%.2f").mkString("[", ",", "]")}")
    spark.stop()
  }
}
