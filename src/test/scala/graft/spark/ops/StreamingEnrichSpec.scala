package graft.spark.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.StreamingEnrich
import graft.streaming.StreamingEnrich.{Ev, Enriched, LastPurch}

class StreamingEnrichSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-enrich")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("batch-mode enrichment equals the r9 as-of join") {
    val stateful = StreamingEnrich.enrich(StreamingEnrich.fromParquet(spark, sf))
      .collect().map(e => e.event_id -> ((e.purch_id, e.gap_s))).toMap
    val asof = graft.SparkEntry.queries("r9_asof")(spark, sf).collect()
      .map { r =>
        val p = if (r.isNullAt(3)) None else Some(r.getLong(3))
        val g = if (r.isNullAt(4)) None else Some(r.getLong(4))
        r.getLong(0) -> ((p, g))
      }.toMap
    assert(stateful.size == asof.size)
    assert(stateful == asof)
  }

  /** Minimal in-memory GroupState for driving enrichFn directly. */
  private final class FakeState extends GroupState[LastPurch] {
    private var v: Option[LastPurch] = None
    override def exists: Boolean = v.isDefined
    override def get: LastPurch = v.get
    override def getOption: Option[LastPurch] = v
    override def update(s: LastPurch): Unit = v = Some(s)
    override def remove(): Unit = v = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, a: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  test("state carries attribution across micro-batches") {
    val st = new FakeState
    // batch 1: a view (no purchase yet), then a purchase at t=20
    val b1 = StreamingEnrich.enrichFn(7L,
      Iterator(Ev(7L, 1L, 10L, false), Ev(7L, 2L, 20L, true)), st).toSeq
    assert(b1 == Seq(Enriched(1L, 7L, None, None), Enriched(2L, 7L, None, None)))
    // batch 2: events after the purchase are attributed to it, a new
    // purchase at t=40 takes over strictly afterwards
    val b2 = StreamingEnrich.enrichFn(7L,
      Iterator(Ev(7L, 4L, 40L, true), Ev(7L, 3L, 30L, false), Ev(7L, 5L, 50L, false)),
      st).toSeq
    assert(b2 == Seq(
      Enriched(3L, 7L, Some(2L), Some(10L)),
      Enriched(4L, 7L, Some(2L), Some(20L)),  // the purchase itself: prior one
      Enriched(5L, 7L, Some(4L), Some(10L)))) // strictly-after: the new one
    assert(st.getOption.contains(LastPurch(4L, 40L)))
  }
}
