package graft.spark.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join for LARGE-by-LARGE sides.
  *
  * The naive plan for `point >= lo AND point < hi` is a
  * BroadcastNestedLoopJoin (fine only when one side is tiny) or a
  * CartesianProduct (never fine). This op makes the join an EQUI-join:
  * each right interval [lo, hi) is exploded to the integer buckets of
  * width `bucketWidth` it overlaps, the left point is keyed by its
  * bucket, and the equi-join on the bucket carries the residual range
  * predicate. Cost: one hash exchange per side on the bucket key plus a
  * right-side blow-up of ceil(width/bucketWidth) rows per interval — set
  * `bucketWidth` near the median interval width so most intervals explode
  * to 1–3 rows. Overlapping intervals are supported (one output row per
  * containing interval); points and bounds must be non-negative longs
  * (shift first otherwise — `div` truncates toward zero).
  *
  * This is the third of the custom-operator trio next to [[AsofJoin]] and
  * the MinHash/SimHash sketches: the shapes Spark's builtin join
  * strategies don't cover at scale.
  */
object RangeJoin {
  def pointInInterval(
      left: DataFrame,
      point: String,
      right: DataFrame,
      lo: String,
      hi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__pb", expr(s"$point div $bucketWidth"))
    // empty/inverted intervals (hi <= lo) are dropped BEFORE the explode
    // (ADVICE r6): sequence() descends for hi <= lo, silently
    // materializing up to (lo-hi)/bucketWidth spurious bucket rows per
    // bad interval; such intervals can match no point anyway
    val rb = right.where(expr(s"$hi > $lo")).withColumn("__ib",
      explode(sequence(expr(s"$lo div $bucketWidth"),
        expr(s"($hi - 1) div $bucketWidth"))))
    lb.join(rb, lb("__pb") === rb("__ib") &&
        col(point) >= col(lo) && col(point) < col(hi))
      .drop("__pb").drop("__ib")
  }
}
