package graft.spark.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** AsofJoin (r9) + TextOps.keywords (t14) unit tests on hand-built frames. */
class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-asof")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def frames() = {
    val ss = spark; import ss.implicits._
    // left: (id, key, t); right: (key, t, payload)
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 15L), (5L, "c", 5L)).toDF("id", "k", "t")
    val right = Seq(("a", 10L, "a10"), ("a", 30L, "a30"),
      ("b", 10L, "b10"), ("b", 20L, "b20")).toDF("k", "t", "v")
    (left, right)
  }

  test("asof strict: greatest right time STRICTLY before left time, left outer") {
    val (left, right) = frames()
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"), strict = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      1L -> None,          // right a@10 is NOT visible at left t=10 (strict)
      2L -> Some("a10"),
      3L -> Some("a10"),   // right a@30 excluded at equal time
      4L -> Some("b10"),   // b20 is in the future
      5L -> None))         // key c has no right rows at all
  }

  test("asof non-strict: equal-time right row is visible") {
    val (left, right) = frames()
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"), strict = false)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out(1L) == Some("a10"))
    assert(out(3L) == Some("a30"))
    assert(out(4L) == Some("b10"))
  }

  test("asof matches brute-force expectation on random data") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(42)
    val leftRows = (0 until 300).map(i => (i.toLong, "k" + rnd.nextInt(5), rnd.nextInt(50).toLong))
    // unique (key, time) on the right, as the contract requires
    val rightRows = rnd.shuffle((0 until 5).flatMap(k => (0 until 50).map(t => ("k" + k, t.toLong))))
      .take(80).map { case (k, t) => (k, t, s"$k@$t") }
    val left = leftRows.toDF("id", "k", "t")
    val right = rightRows.toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"), strict = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    leftRows.foreach { case (id, k, t) =>
      val expect = rightRows.filter(r => r._1 == k && r._2 < t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == expect, s"row $id ($k, $t)")
    }
  }

  test("range join matches brute-force expectation, incl. overlapping intervals") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(5000).toLong))
    // overlapping, varied-width intervals; some wider than the bucket
    val ivs = (0 until 60).map { j =>
      val lo = rnd.nextInt(4800).toLong
      (j.toLong, lo, lo + 1 + rnd.nextInt(900))
    }
    val got = RangeJoin.pointInInterval(
      pts.toDF("id", "p"), "p", ivs.toDF("iv", "lo", "hi"), "lo", "hi", 256L)
      .select("id", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (id, p) <- pts; (iv, lo, hi) <- ivs if p >= lo && p < hi
    } yield (id, iv)).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("range join survives intervals narrower than one bucket and exact boundaries") {
    val ss = spark; import ss.implicits._
    val pts = Seq((1L, 0L), (2L, 255L), (3L, 256L), (4L, 511L), (5L, 512L)).toDF("id", "p")
    val ivs = Seq((10L, 0L, 256L), (11L, 256L, 512L), (12L, 500L, 600L)).toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 256L)
      .select("id", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 11L), (4L, 12L), (5L, 12L)))
  }

  test("keywords: rare tokens outrank common ones, deterministic ranks") {
    val ss = spark; import ss.implicits._
    val docs = Seq(
      (1L, "aa aa bb"),
      (2L, "bb cc"),
      (3L, "bb dd dd")).toDF("doc_id", "text")
    val out = TextOps.keywords(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // N=3; df: aa=1 bb=3 cc=1 dd=1; idf surrogate: rare=3e6, bb=1e6
    assert(out((1L, 1)) == (("aa", 2L, 6000000L)))
    assert(out((1L, 2)) == (("bb", 1L, 1000000L)))
    assert(out((2L, 1)) == (("cc", 1L, 3000000L)))
    assert(out((2L, 2)) == (("bb", 1L, 1000000L)))
    assert(out((3L, 1)) == (("dd", 2L, 6000000L)))
    assert(out((3L, 2)) == (("bb", 1L, 1000000L)))
  }
}
