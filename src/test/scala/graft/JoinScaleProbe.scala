package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-cluster-size scaling probe for the round-6 join operators:
  * r9's as-of join (one exchange on the key + window sort) and r10's
  * bucketed range join (exploded-interval equi-join). Same protocol as
  * SpanScaleProbe — run twice in FRESH taskset-pinned JVMs:
  *
  *   taskset -c 4-5   sbt -batch "Test/runMain graft.JoinScaleProbe 2 asof"
  *   taskset -c 4-11  sbt -batch "Test/runMain graft.JoinScaleProbe 8 asof"
  *
  * efficiency = (wall_2 / wall_8) / 4; min of the post-warmup runs.
  *
  * The events table is replicated `rep`x with SHIFTED user ids, so key
  * cardinality grows with the data (per-key work constant — the shape a
  * bigger crawl actually has) and the window never degenerates into few
  * giant partitions.
  *
  * Usage: Test/runMain graft.JoinScaleProbe <cores> <asof|range> [sfDir] [runs] [rep]
  */
object JoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val which = if (args.length > 1) args(1) else "asof"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val runs = if (args.length > 3) args(3).toInt else 4
    val rep = if (args.length > 4) args(4).toInt else 30
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.spark.ops.{AsofJoin, RangeJoin}

    val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
    val ev =
      if (rep <= 1) ev0
      else spark.range(0, rep, 1, math.max(2, cores)).toDF("rep")
        .join(broadcast(ev0))
        .select((col("event_id") + col("rep") * 1000000000L).as("event_id"),
          (col("user_id") + col("rep") * 10000L).as("user_id"),
          col("event_type"), col("ts"), col("value"))

    def job(): Long = which match {
      case "base" =>
        // the replication harness alone — attributes any sub-linear pair
        // to the broadcast-streaming input generation, not the operator
        ev.select(col("event_id")).queryExecution.toRdd.count()
      case "rangesynth" =>
        // synthetic points from pure range arithmetic (no broadcast
        // streaming): isolates the range-join operator itself
        val pts = spark.range(0, rep * 100000L, 1, math.max(2, cores))
          .select(col("id").as("event_id"),
            pmod(xxhash64(col("id")), lit(49000L)).as("cents"))
        val bands = spark.range(0, 100).select(
          col("id").as("band_id"), (col("id") * 500).as("lo"),
          (col("id") * 500 + 1200).as("hi"))
        RangeJoin.pointInInterval(pts, "cents", bands, "lo", "hi", 512L)
          .groupBy(col("band_id")).count()
          .queryExecution.toRdd.count()
      case "asof" =>
        val purch = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("purch_id"))
        AsofJoin.asofJoin(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          purch, "user_id", "ts", "ts", Seq("purch_id"))
          .queryExecution.toRdd.count()
      case "range" | "rangeagg" =>
        val pts = ev.select(col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        val bands = spark.range(0, 100).select(
          col("id").as("band_id"), (col("id") * 500).as("lo"),
          (col("id") * 500 + 1200).as("hi"))
        val j = RangeJoin.pointInInterval(pts, "cents", bands, "lo", "hi", 512L)
        // 'range' materializes every joined row (measures the box's
        // UnsafeRow-production bandwidth as much as the join); 'rangeagg'
        // consumes the join in-stage with a partial aggregate — the
        // fair measure of the join compute itself, and the realistic
        // downstream (nobody counts 1e9 rows by materializing them)
        (if (which == "rangeagg") j.groupBy(col("band_id")).count() else j)
          .queryExecution.toRdd.count()
      case other => sys.error(s"unknown probe: $other")
    }

    val times = Array.tabulate(runs) { _ =>
      val t0 = System.nanoTime()
      val rows = job()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val walls = times.map(_._1)
    println(f"[joinscale] cores=$cores op=$which sf=$sfDir rep=$rep rows=${times.head._2} " +
      f"min=${walls.drop(1).min}%6.2f s runs=${walls.map(w => f"$w%.2f").mkString("[", ",", "]")}")
    spark.stop()
  }
}
