package graft.spark.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * (sign-random-projection) approximate variant as the scale path.
  *
  * Scale notes: brute force is a broadcast nested loop of the (small)
  * query set against the corpus — one pass, no shuffle of the big side;
  * the LSH variant buckets the corpus once (row-local code computation +
  * one shuffle on bucket id) and probes only matching buckets, turning
  * top-k into a per-bucket local problem.
  */
object SimOps {

  /** Cosine similarity of two float-array columns, computed in double
    * precision with sequential accumulation (bit-compatible with the
    * DuckDB oracle's list_dot_product over DOUBLE[]).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force cosine top-k for the query vectors (vec_id in
    * `queryIds`), excluding self-matches. Returns
    * (query_id, neighbor_id, rank, sim rounded to 4dp).
    */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = emb.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(queries))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("embedding")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  // ---- LSH-bucketed ANN (scale path) ----

  val NumPlanes = 12

  /** Deterministic pseudo-random hyperplane component for (plane, dim). */
  @inline private def planeComp(p: Int, d: Int): Double = {
    val h = DedupOps.mix64(p.toLong * 1048573L + d.toLong + 0x9e3779b97f4a7c15L)
    // map to [-1, 1)
    (h >> 11).toDouble / (1L << 52).toDouble
  }

  /** Sign-random-projection bucket code (row-local). */
  def bucketCode(v: Array[Float]): Int = {
    var code = 0
    var p = 0
    while (p < NumPlanes) {
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * planeComp(p, d); d += 1 }
      if (s > 0) code |= (1 << p)
      p += 1
    }
    code
  }

  /** Bucket codes for all vectors plus the probe set: each query probes
    * its own bucket and all hamming-distance-1 buckets (multi-probe LSH).
    * Approximate top-k; recall vs brute force asserted in SimOpsSpec.
    */
  def annTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val coded = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, bucketCode(v)) }
      .toDF("vec_id", "embedding", "bucket")

    val probes = coded.where(col("vec_id").isInCollection(queryIds))
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, b) =>
        (Seq(b) ++ (0 until NumPlanes).map(p => b ^ (1 << p))).map(pb => (id, v, pb))
      }
      .toDF("query_id", "q_emb", "bucket")

    val scored = coded.join(broadcast(probes), "bucket")
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("embedding")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("sim"))
  }
}
