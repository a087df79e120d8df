package graft.spark.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (temporal) join: for each left row, attach the payload of
  * the right row with the greatest `rightTime` before `leftTime` within the
  * same `key` group ("last known value" / last-touch attribution).
  *
  * Implementation is the scale-correct union+window form, NOT a range join:
  * both sides are tagged and unioned, shuffled ONCE by `key`, sorted by
  * (time, side), and the attachment is a running `last(payload, ignoreNulls)`
  * window. There is no join operator at all, so there is no range-explosion
  * and no per-key cross product — wall cost is one exchange plus one sort,
  * identical to a groupBy over the union, which is the plan you want when
  * both sides are 100-TB-scale event streams. (A broadcast range join only
  * wins when the right side fits in memory; this form needs no such bound.)
  *
  * Tie semantics: `strict = true` means a right row at exactly `leftTime` is
  * NOT visible (right sorts after left at equal time); `strict = false`
  * means it is (right sorts first). For deterministic output the right side
  * must be unique per (key, time) — pre-aggregate otherwise (the same
  * contract DuckDB's ASOF JOIN leaves unspecified at ties).
  *
  * Left rows with no qualifying right row keep null payload columns (LEFT
  * OUTER as-of). Payload column names must not collide with left columns.
  */
object AsofJoin {
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      strict: Boolean = true): DataFrame = {
    val lCols = left.columns.toSeq
    def packed(cols: Seq[String]): Column = struct(cols.map(col): _*)
    val lType = left.select(packed(lCols).as("s")).schema("s").dataType
    val rType = right.select(packed(rightPayload).as("s")).schema("s").dataType
    // At equal time: strict => left first (right invisible to it);
    // non-strict => right first (visible).
    val (lOrd, rOrd) = if (strict) (0, 1) else (1, 0)
    val lt = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(lOrd).as("__s"),
      packed(lCols).as("__l"), lit(null).cast(rType).as("__r"))
    val rt = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(rOrd).as("__s"),
      lit(null).cast(lType).as("__l"), packed(rightPayload).as("__r"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lt.unionByName(rt)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__l").isNotNull)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
