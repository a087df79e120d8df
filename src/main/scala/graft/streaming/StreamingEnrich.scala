package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-known-value enrichment — the stream analog of the r9
  * as-of join: each event is attributed to the most recent STRICTLY-prior
  * purchase by the same user, with the "last purchase" carried as
  * per-user `flatMapGroupsWithState` state across micro-batches (state is
  * two longs per user — bounded regardless of stream length, unlike
  * buffering the purchase stream).
  *
  * Contract: when events arrive in event-time order per user (per-batch
  * reordering is fine — each batch group is sorted in-function), the
  * cumulative streaming output equals the batch [[graft.spark.ops.AsofJoin]]
  * over the full data; StreamingEnrichSpec pins that equality plus the
  * cross-batch state carry. Same strict-tie semantics as r9: a purchase
  * attributes events strictly after it, never itself.
  */
object StreamingEnrich {

  final case class Ev(user_id: Long, event_id: Long, epochSec: Long, isPurchase: Boolean)
  final case class LastPurch(purchId: Long, purchSec: Long)
  final case class Enriched(event_id: Long, user_id: Long,
      purch_id: Option[Long], gap_s: Option[Long])

  def enrichFn(userId: Long, events: Iterator[Ev],
      state: GroupState[LastPurch]): Iterator[Enriched] = {
    var st = state.getOption.orNull
    // sort non-purchases BEFORE same-time purchases (ADVICE r6): a
    // purchase must not be visible to an event at the SAME timestamp —
    // that is AsofJoin's strict-tie contract; without the isPurchase key
    // the equality held only because (user_id, ts) is unique in the
    // events table
    val out = events.toArray
      .sortBy(e => (e.epochSec, e.isPurchase, e.event_id)).map { e =>
      val res =
        if (st == null) Enriched(e.event_id, userId, None, None)
        else Enriched(e.event_id, userId, Some(st.purchId), Some(e.epochSec - st.purchSec))
      if (e.isPurchase) st = LastPurch(e.event_id, e.epochSec)
      res
    }
    if (st != null) state.update(st)
    out.iterator
  }

  /** Works on both batch and streaming Datasets (the sessionize pattern). */
  def enrich(events: Dataset[Ev]): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(enrichFn)
  }

  def fromParquet(spark: SparkSession, sfDir: String): Dataset[Ev] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("epochSec"),
        (col("event_type") === "purchase").as("isPurchase"))
      .as[Ev]
  }
}
