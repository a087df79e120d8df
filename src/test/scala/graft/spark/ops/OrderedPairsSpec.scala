package graft.spark.ops

import org.scalatest.funsuite.AnyFunSuite

/** The bucket pair expansion must stream lazily: a cap-sized bucket's
  * O(n^2/2) pair list may never be staged in memory before the runtime
  * consumes it (round-2 verdict: the ArrayBuffer version buffered up to
  * ~50M tuples / ~1.6 GB in one task).
  */
class OrderedPairsSpec extends AnyFunSuite {

  test("emits exactly the ordered pairs, in row-major order") {
    val got = DedupOps.orderedPairs(Seq(1L, 2L, 3L, 4L)).toList
    assert(got == List((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("degenerate buckets: empty and singleton emit nothing") {
    assert(DedupOps.orderedPairs(Seq.empty).isEmpty)
    assert(DedupOps.orderedPairs(Seq(7L)).isEmpty)
  }

  test("pair count matches n*(n-1)/2 and streams without staging") {
    val n = 3000
    val it = DedupOps.orderedPairs((1L to n.toLong).toSeq)
    var c = 0L
    while (it.hasNext) { it.next(); c += 1 }
    assert(c == n.toLong * (n - 1) / 2)
  }

  test("a 200k-member bucket's first pairs are O(1): no O(n^2) staging") {
    // 200k ids -> ~2e10 pairs; materializing them would OOM/hang. take(3)
    // must return immediately because the iterator is lazy.
    val t0 = System.nanoTime()
    val head = DedupOps.orderedPairs((1L to 200000L).toSeq).take(3).toList
    val ms = (System.nanoTime() - t0) / 1e6
    assert(head == List((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(ms < 2000.0)
  }
}
