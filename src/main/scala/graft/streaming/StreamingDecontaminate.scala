package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.spark.ops.DedupOps

/** Streaming benchmark decontamination — the stream analog of d15
  * ([[DedupOps.decontaminateBloom]]): the eval-set n-gram Bloom filter is
  * built ONCE (batch, distributed aggregate), then incoming crawl
  * micro-batches are flagged by a row-local probe — map-only, stateless,
  * no shuffle, no stream-side join, so it composes with any output mode
  * and needs no watermark. This is the production crawl shape: eval sets
  * change rarely; the filter is a broadcast-sized constant against an
  * unbounded document stream.
  *
  * Hash parity with the batch path is EXACT by construction: the batch
  * aggregate puts `xxhash64(gram)` longs, and [[Probe]] probes with
  * Catalyst's own `XXH64.hashUTF8String(·, 42L)` — the same function the
  * `xxhash64` column expression evaluates — over the same
  * [[DedupOps.ngramSet]] grams, so streaming verdicts equal
  * `decontaminateBloom`'s `bloom_hit` column bit-for-bit
  * (StreamingDecontaminateSpec pins the equality plus the no-false-negative
  * guarantee on planted contamination).
  */
object StreamingDecontaminate {

  final case class Doc(doc_id: Long, text: String)
  final case class Verdict(doc_id: Long, bloom_hit: Boolean)

  /** Serializable row-local probe; the Bloom bit array deserializes once
    * per executor (lazy, transient), probes are lock-free reads.
    */
  final class Probe(val bloomBytes: Array[Byte], val n: Int) extends Serializable {
    @transient private lazy val bloom =
      org.apache.spark.util.sketch.BloomFilter.readFrom(bloomBytes)
    def hit(text: String): Boolean = {
      val grams = DedupOps.ngramSet(text, n)
      var i = 0
      while (i < grams.length) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(grams(i)), 42L)
        if (bloom.mightContainLong(h)) return true
        i += 1
      }
      false
    }
  }

  /** One-time distributed build of the eval-set filter (the d15 build
    * stage verbatim: row-local grams, xxhash64, BloomFilterAggregate).
    */
  def buildProbe(benchmark: DataFrame, n: Int = 13,
      estItems: Long = 1L << 19, numBits: Long = 1L << 22): Probe = {
    val bytes = DedupOps.evalGramBloom(benchmark, n, estItems, numBits)
    new Probe(bytes, n)
  }

  /** Works on both batch and streaming Datasets (the sessionize pattern):
    * one deserialized filter per executor, one map pass, zero state.
    */
  def verdicts(docs: Dataset[Doc], probe: Probe): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map(d => Verdict(d.doc_id, probe.hit(d.text)))
    }
  }

  /** Convenience: keep only clean documents from a (possibly streaming)
    * (doc_id, text) frame — the apply form used in an ingest pipeline.
    */
  def clean(docs: Dataset[Doc], probe: Probe): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.filter(d => !probe.hit(d.text)))
  }
}
